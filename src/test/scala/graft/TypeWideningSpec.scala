package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, LakeTable}

/** TYPE WIDENING (round-5 VERDICT "Missing" #3): `widenColumn` is a
  * metadata-only commit — old files keep the narrow physical type, every
  * read path promotes at decode time, new batches are cast up at the
  * ingest boundary. Pinned across the batch read, the DSv2 resolve
  * readers, the streaming tail, and compaction.
  */
class TypeWideningSpec extends SparkSpec {

  val cfg = GenConfig(seed = 91, events = 3000, repos = 8, filesPerRepo = 10)

  /** score: int (lsn % 97) below the widening commit, 5e9 + lsn above it —
    * values that only fit the widened type, so any narrowing bug is loud
    */
  private def scored(wal: DataFrame, wide: Boolean): DataFrame =
    if (wide) wal.withColumn("score", lit(5000000000L) + col("lsn"))
    else wal.withColumn("score", (col("lsn") % 97).cast("int"))

  /** trusted baseline: latest (lsn, commit) winner per key over BOTH
    * batches, live rows only, summed score
    */
  private def expectedSum(): Long = {
    val wal = ChangeLogGen.changeLog(spark, cfg)
    val all = scored(wal.where(col("lsn") <= 1500), wide = false)
      .withColumn("score", col("score").cast("long"))
      .unionByName(scored(wal.where(col("lsn") > 1500), wide = true))
    val w = Window.partitionBy("repo", "path").orderBy(col("lsn").desc, col("commit").desc)
    all.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("op") =!= "D")
      .agg(sum("score")).collect().head.getLong(0)
  }

  private def build(tag: String): LakeTable = {
    val t = new LakeTable(spark, tmpDir(tag), defaultBuckets = 4, ApplyMode.MergeOnRead)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    t.merge(scored(wal.where(col("lsn") <= 1500), wide = false), tag, 0L)
    t.widenColumn("score", LongType)
    t.merge(scored(wal.where(col("lsn") > 1500), wide = true), tag, 1L)
    t
  }

  test("widenColumn is metadata-only and every read path promotes old narrow files") {
    val t = build("widen")
    def snapAt(v: Int) = graft.table.SnapshotIO.read(
      t.fs.readString(s"${t.root}/meta/snap-$v.json"),
      mp => t.fs.readString(s"${t.root}/$mp"))
    val preWiden = {
      // version chain: v1 = narrow merge, v2 = widening, v3 = wide merge
      val s1 = snapAt(1); val s2 = snapAt(2)
      assert(StructType.fromDDL(s1.schemaDdl)("score").dataType == IntegerType)
      assert(StructType.fromDDL(s2.schemaDdl)("score").dataType == LongType)
      assert(s1.files.map(_.path) == s2.files.map(_.path),
        "widening must not move a single data file")
      s1.files.map(_.path).toSet
    }
    val exp = expectedSum()
    // 1. batch read (Spark parquet reader promotion on the narrow files)
    assert(t.read().agg(sum("score")).collect().head.getLong(0) == exp)
    // 2. DSv2 resolve read (un-compacted MoR: the engine's own row cursors
    //    must promote INT32 cells under the bigint column)
    val dsv2 = spark.read.format("graft").load(t.root)
    assert(dsv2.schema("score").dataType == LongType)
    assert(dsv2.agg(sum("score")).collect().head.getLong(0) == exp)
    // 3. streaming tail (GroupRowCursor path, CDF off; the TYPED feed so
    //    tombstones are visible and the replica winner-set is the live set)
    val q = spark.readStream.format("graft").option("changeTypes", "true").load(t.root)
      .writeStream.format("memory").queryName("widen_tail")
      .option("checkpointLocation", tmpDir("cpwiden"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val w = Window.partitionBy("repo", "path").orderBy(col("lsn").desc, col("commit").desc)
    val tailSum = spark.table("widen_tail")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("_change_type") =!= "delete")
      .agg(sum("score")).collect().head.getLong(0)
    assert(tailSum == exp, "streaming tail must promote narrow files too")
    // 4. the post-widening batch was cast UP at the boundary: files written
    //    after the widening carry the wide physical type
    val newFiles = t.currentSnapshot().get.files.map(_.path).filterNot(preWiden)
    assert(newFiles.nonEmpty)
    assert(spark.read.parquet(newFiles.map(t.resolvePath): _*)
      .schema("score").dataType == LongType)
    // 5. compaction folds narrow+wide files without loss
    t.compact()
    assert(t.read().agg(sum("score")).collect().head.getLong(0) == exp)
    assert(spark.read.format("graft").load(t.root)
      .agg(sum("score")).collect().head.getLong(0) == exp)
  }

  test("widening x CDF: sidecars written narrow serve the typed feed under the wide schema") {
    // sidecar parquet written before the widening carries INT32 score;
    // the typed tail and the batch table_changes read must both promote
    val t = new LakeTable(spark, tmpDir("widencdf"), defaultBuckets = 4,
      ApplyMode.MergeOnRead, defaultCdf = true)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    t.merge(scored(wal.where(col("lsn") <= 1500), wide = false), "wcdf", 0L)
    t.widenColumn("score", LongType)
    t.merge(scored(wal.where(col("lsn") > 1500), wide = true), "wcdf", 1L)
    val changes = t.readChangesBetween(0L)
    assert(changes.schema("score").dataType == LongType)
    // every change row carries the exact score: int grams below 1500,
    // beyond-int values above — winner-per-(key, batch) granularity
    val bad = changes.where(
      (col("lsn") <= 1500 && col("score") =!= (col("lsn") % 97)) ||
      (col("lsn") > 1500 && col("score") =!= lit(5000000000L) + col("lsn"))).count()
    assert(bad == 0, "promoted sidecar values must be exact")
    // streamed typed tail over the same (narrow + wide) sidecars
    val q = spark.readStream.format("graft").option("changeTypes", "true").load(t.root)
      .writeStream.format("memory").queryName("widen_cdf_tail")
      .option("checkpointLocation", tmpDir("cpwidencdf"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("widen_cdf_tail")
      .select("repo", "path", "lsn", "commit", "score").collect()
      .map(_.toSeq).toSet
    val batch = changes.select("repo", "path", "lsn", "commit", "score").collect()
      .map(_.toSeq).toSet
    assert(streamed == batch, "streamed and batch typed changes must agree bit-for-bit")
  }

  test("a NARROW batch after widening is accepted and cast up (steady-state ingest)") {
    val t = build("widen2")
    // upstream still sends int — unionSchema resolves to the wider declared
    // type and clean() casts, so the table schema never flaps
    val wal = ChangeLogGen.changeLog(spark, cfg)
    t.merge(scored(wal.where(col("lsn") > 1500), wide = false)
      .withColumn("lsn", col("lsn") + 3000L), "widen2", 2L)
    val snap = t.currentSnapshot().get
    assert(StructType.fromDDL(snap.schemaDdl)("score").dataType == LongType)
    assert(spark.read.format("graft").load(t.root).schema("score").dataType == LongType)
  }

  test("guards: unsafe widenings, core columns, idempotence, unknown column") {
    val t = build("widen3")
    intercept[IllegalArgumentException](t.widenColumn("score", IntegerType)) // narrowing
    intercept[IllegalArgumentException](t.widenColumn("score", StringType))  // not in the lattice
    intercept[IllegalArgumentException](t.widenColumn("lsn", DoubleType))    // core CDC column
    intercept[IllegalArgumentException](t.widenColumn("nope", LongType))     // absent
    val v = t.currentSnapshot().get.version
    t.widenColumn("score", LongType) // already long: idempotent no-op
    assert(t.currentSnapshot().get.version == v, "idempotent widening must not commit")
    // int -> double is in the lattice and exact (every int fits a double)
    val d = new LakeTable(spark, tmpDir("widen4"), defaultBuckets = 2, ApplyMode.MergeOnRead)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    d.merge(scored(wal.where(col("lsn") <= 300), wide = false), "wd", 0L)
    val intSum = d.read().agg(sum("score")).collect().head.getLong(0)
    d.widenColumn("score", DoubleType)
    assert(d.read().schema("score").dataType == DoubleType)
    assert(d.read().agg(sum("score")).collect().head.getDouble(0) == intSum.toDouble)
    assert(spark.read.format("graft").load(d.root)
      .agg(sum("score")).collect().head.getDouble(0) == intSum.toDouble)
  }

  test("SQL surface: CALL g.system.widen_column widens through the catalog") {
    val warehouse = tmpDir("widensql")
    val cat = "gwiden"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"""CREATE TABLE $cat.w (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT, score INT)
      TBLPROPERTIES ('mode' = 'mor', 'buckets' = '2')""")
    spark.sql(s"INSERT INTO $cat.w VALUES ('r1','a.py','c1',null,'alpha',null,1,7)")
    val res = spark.sql(s"CALL $cat.system.widen_column('w', 'score', 'bigint')").collect().head
    assert(res.getString(0) == "score" && res.getString(1) == "bigint")
    spark.sql(s"INSERT INTO $cat.w VALUES ('r2','b.rs','c2',null,'beta',null,2,5000000000)")
    val rows = spark.sql(s"SELECT sum(score) FROM $cat.w").collect().head
    assert(rows.getLong(0) == 5000000007L,
      "post-widening values beyond int range must survive the SQL read")
  }
}
