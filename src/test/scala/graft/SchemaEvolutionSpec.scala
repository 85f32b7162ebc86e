package graft

import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, LakeTable}

/** Suite 2 (SURVEY.md §5.2): additive schema evolution. Mid-stream, events
  * gain a new nullable column `branch` (FIXTURES.md §5); old rows must read
  * back null-backfilled, and files written before the evolution must stay
  * readable under the evolved schema. Precedent: the reference adds
  * `processing_timestamp`/`source_layer` between stages
  * (process_layers.py:286-291).
  */
class SchemaEvolutionSpec extends SparkSpec {

  val cfg = GenConfig(seed = 11, events = 4000, repos = 30, filesPerRepo = 30)

  test("additive column arrives mid-stream; old rows null-backfill") {
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      val t = new LakeTable(spark, tmpDir("evo"), defaultBuckets = 8, ApplyMode.CopyOnWrite)
      // pre-evolution batch: original envelope
      t.merge(wal.where(col("lsn") <= 3600), "evo", 0L)
      val preSchema = t.currentSnapshot().get.schemaDdl
      assert(!preSchema.contains("branch"))

      // evolution: the remaining 40% of the stream carries `branch`
      val evolved = wal.where(col("lsn") > 3600)
        .withColumn("branch", concat(lit("feature/"), pmod(col("lsn"), lit(5)).cast("string")))
      t.merge(evolved, "evo", 1L)
      val postSchema = t.currentSnapshot().get.schemaDdl
      assert(postSchema.contains("branch"))

      val out = t.read()
      assert(out.columns.contains("branch"))
      // keys last touched before the evolution read back with branch = null
      val nullBranch = out.where(col("branch").isNull && col("lsn") <= 3600).count()
      val preKeys = out.where(col("lsn") <= 3600).count()
      assert(preKeys > 0 && nullBranch == preKeys, "pre-evolution rows must be null-backfilled")
      // evolved rows carry their value
      val post = out.where(col("lsn") > 3600)
      assert(post.count() > 0 && post.where(col("branch").isNull).count() == 0)

      // final state still equals the oracle on the invariant columns
      val evs = wal.collect().toSeq.map(r => OracleApplier.Ev(
        r.getAs[Long]("lsn"), r.getAs[String]("op"), r.getAs[String]("repo"),
        r.getAs[String]("path"), r.getAs[String]("commit"), r.getAs[String]("content")))
      val got = out.select("repo", "path", "commit", "lang", "contentSha").collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))).sorted
      assert(got == OracleApplier.liveRows(evs))
    } finally wal.unpersist()
  }

  test("MOR: a NARROWER batch after evolution must not regress the schema") {
    // regression (round-1 advice): a post-evolution batch that lacks the
    // evolved column used to reset schemaDdl to the batch schema, silently
    // dropping the column on every read and permanently on compact().
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      val t = new LakeTable(spark, tmpDir("evoNarrow"), defaultBuckets = 8, ApplyMode.MergeOnRead)
      t.merge(wal.where(col("lsn") <= 1500), "evo", 0L)
      // batch 1 evolves: adds `branch`
      t.merge(wal.where(col("lsn") > 1500 && col("lsn") <= 2500)
        .withColumn("branch", lit("main")), "evo", 1L)
      // batch 2 arrives from a fixed-schema source WITHOUT `branch`
      t.merge(wal.where(col("lsn") > 2500), "evo", 2L)

      assert(t.currentSnapshot().get.schemaDdl.contains("branch"),
        "schema regressed: evolved column lost after a narrower batch")
      val out = t.read()
      assert(out.columns.contains("branch"))
      // keys last touched in the evolved batch keep their branch value
      val evolvedLive = out.where(col("lsn") > 1500 && col("lsn") <= 2500)
      assert(evolvedLive.count() > 0 && evolvedLive.where(col("branch").isNull).count() == 0)

      t.compact()
      val out2 = t.read()
      assert(out2.columns.contains("branch"), "compact() dropped the evolved column")
      assert(collectSorted(out.select("repo", "path", "commit", "branch")) ==
        collectSorted(out2.select("repo", "path", "commit", "branch")))
    } finally wal.unpersist()
  }

  test("unionSchema: add-only, null-backfill, type change rejected") {
    import org.apache.spark.sql.types._
    val prev = StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val next = StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("c", IntegerType, nullable = false)))
    val u = LakeTable.unionSchema(prev, next)
    assert(u.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(u("b").nullable, "field absent from batch must become nullable")
    assert(u("c").nullable, "new field must be nullable")
    val bad = StructType(Seq(StructField("a", StringType)))
    intercept[IllegalArgumentException](LakeTable.unionSchema(prev, bad))
  }

  test("evolution works in MergeOnRead mode too (deltas with mixed schemas)") {
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      val t = new LakeTable(spark, tmpDir("evoMor"), defaultBuckets = 8, ApplyMode.MergeOnRead)
      t.merge(wal.where(col("lsn") <= 2000), "evo", 0L)
      t.merge(wal.where(col("lsn") > 2000).withColumn("branch", lit("main")), "evo", 1L)
      val out = t.read()
      assert(out.columns.contains("branch"))
      assert(out.where(col("lsn") <= 2000 && col("branch").isNotNull).count() == 0)
      t.compact()
      val out2 = t.read()
      assert(collectSorted(out.select("repo", "path", "commit", "branch")) ==
        collectSorted(out2.select("repo", "path", "commit", "branch")))
    } finally wal.unpersist()
  }
}
