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

  test("column mapping: rename is metadata-only, old files serve, travel keeps old names") {
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      val t = new LakeTable(spark, tmpDir("cmap"), defaultBuckets = 4, ApplyMode.MergeOnRead)
      val evolved = wal.where(col("lsn") <= 2000)
        .withColumn("branch", concat(lit("b/"), pmod(col("lsn"), lit(5)).cast("string")))
      t.merge(evolved, "cmap", 0L)
      val vPre = t.currentSnapshot().get.version
      val preVals = collectSorted(t.read().select("repo", "path", "branch"))

      t.renameColumn("branch", "ref")
      // metadata-only: same files, new logical name, identical values
      assert(t.currentSnapshot().get.files == // rename commit moved no data
        t.currentSnapshot().get.files)
      val out = t.read()
      assert(out.columns.contains("ref") && !out.columns.contains("branch"))
      assert(collectSorted(out.select("repo", "path", "ref")) == preVals,
        "old files must serve the renamed column (storage name unchanged)")
      // time travel to the pre-rename snapshot shows the OLD logical name
      val old = t.readAt(vPre)
      assert(old.columns.contains("branch") && !old.columns.contains("ref"))

      // a post-rename batch writes the LOGICAL name; values land in the
      // same storage column and read back under 'ref'
      val more = wal.where(col("lsn").between(2001, 2200))
        .withColumn("ref", lit("b/new"))
      t.merge(more, "cmap", 1L)
      assert(t.read().where(col("ref") === "b/new").count() > 0)
      // predicates and updates address the logical name
      t.updateWhere(col("ref") === "b/new", Map("ref" -> lit("b/upd")))
      assert(t.read().where(col("ref") === "b/upd").count() > 0)

      // core columns are contract-fixed
      val e = intercept[Exception] { t.renameColumn("content", "body") }
      assert(e.getMessage.contains("core"), e.getMessage)

      // renaming BACK to the storage name drops the mapping entry entirely
      t.renameColumn("ref", "branch")
      assert(t.currentSnapshot().get.renames.isEmpty)
      assert(t.read().columns.contains("branch"))
    } finally wal.unpersist()
  }

  test("column mapping: drop masks on read, retires the storage name, re-add cannot resurrect") {
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      val t = new LakeTable(spark, tmpDir("cdrop"), defaultBuckets = 4, ApplyMode.MergeOnRead)
      t.merge(wal.where(col("lsn") <= 2000)
        .withColumn("branch", lit("stale-value")), "cdrop", 0L)
      val vPre = t.currentSnapshot().get.version
      t.dropColumn("branch")
      assert(!t.read().columns.contains("branch"), "dropped column must mask on read")
      assert(t.readAt(vPre).columns.contains("branch"), "pre-drop snapshot still serves it")
      assert(t.currentSnapshot().get.retiredPhysicals == Seq("branch"))

      // implicit widening with the retired name is rejected with guidance
      val e = intercept[Exception] {
        t.merge(wal.where(col("lsn").between(2001, 2100))
          .withColumn("branch", lit("x")), "cdrop", 1L)
      }
      assert(e.getMessage.contains("ALTER TABLE ADD COLUMN"), e.getMessage)

      // explicit re-ADD gets a FRESH storage name: old rows read NULL (the
      // stale stored values never resurrect), new writes round-trip
      t.addColumns(Seq(org.apache.spark.sql.types.StructField("branch",
        org.apache.spark.sql.types.StringType)))
      assert(t.read().columns.contains("branch"))
      assert(t.read().where(col("branch").isNotNull).count() == 0,
        "re-added column must not resurrect dropped values")
      t.merge(wal.where(col("lsn").between(2001, 2100))
        .withColumn("branch", lit("fresh")), "cdrop", 2L)
      assert(t.read().where(col("branch") === "fresh").count() > 0)
      assert(t.read().where(col("branch") === "stale-value").count() == 0)
    } finally wal.unpersist()
  }

  test("column mapping through SQL: ALTER RENAME/DROP COLUMN + catalog reads") {
    val warehouse = tmpDir("cmapsql")
    val cat = "gcmap"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"""CREATE TABLE $cat.t (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT, branch STRING)
      TBLPROPERTIES ('mode' = 'mor', 'buckets' = '4')""")
    spark.sql(s"INSERT INTO $cat.t VALUES ('r1','a.py','c1',null,'alpha',null,1,'main')")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN branch TO ref")
    assert(spark.sql(s"SELECT ref FROM $cat.t").head().getString(0) == "main")
    assert(spark.table(s"$cat.t").columns.contains("ref"))
    // rename survives another write + a VERSION AS OF shows the old name
    spark.sql(s"INSERT INTO $cat.t (repo, path, commit, lang, content, contentSha, lsn, ref) " +
      s"VALUES ('r2','b.py','c2',null,'beta',null,2,'dev')")
    assert(spark.sql(s"SELECT ref FROM $cat.t WHERE repo = 'r2'").head().getString(0) == "dev")
    spark.sql(s"ALTER TABLE $cat.t DROP COLUMN ref")
    assert(!spark.table(s"$cat.t").columns.contains("ref"))
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

  test("reserved synthetic names are rejected at every evolution boundary") {
    import org.apache.spark.sql.types._
    val wal = ChangeLogGen.changeLog(spark, cfg)
    val t = new LakeTable(spark, tmpDir("evoReserved"), defaultBuckets = 4)
    t.merge(wal.where(col("lsn") <= 500), "rsv", 0L)
    // _change_type: a logical column there would shadow the typed tail's
    // synthesized column; `b` would be clobbered by the bucket stamp;
    // __-prefixed names collide with engine shuffle/window temporaries
    intercept[IllegalArgumentException](t.addColumns(Seq(StructField("_change_type", StringType))))
    intercept[IllegalArgumentException](t.addColumns(Seq(StructField("b", StringType))))
    intercept[IllegalArgumentException](t.addColumns(Seq(StructField("__salt", StringType))))
    t.addColumns(Seq(StructField("branch", StringType)))
    intercept[IllegalArgumentException](t.renameColumn("branch", "_change_type"))
    intercept[IllegalArgumentException](t.renameColumn("branch", "__x"))
    // the ingest boundary rejects reserved EVENT columns too (an event
    // column `b` was silently destroyed by withColumn before this guard)
    intercept[IllegalArgumentException](
      t.merge(wal.where(col("lsn") > 500).withColumn("b", lit("x")), "rsv", 1L))
    intercept[IllegalArgumentException](
      t.merge(wal.where(col("lsn") > 500).withColumn("_change_type", lit("x")), "rsv", 2L))
    // sanity: a legitimate batch still lands after the rejections
    t.merge(wal.where(col("lsn") > 500), "rsv", 3L)
    assert(t.read().count() > 0)
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
