package graft

import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.stream.MetricsStream
import graft.table.{ApplyMode, LakeTable}

/** Data skipping, incremental reads, stale-event ledger accounting, and the
  * stateful streaming metrics aggregation.
  */
class IncrementalReadSpec extends SparkSpec {

  val cfg = GenConfig(seed = 21, events = 6000, repos = 15, filesPerRepo = 20)

  test("readChangedSince skips files by lsn stats and returns exactly the changed keys") {
    val t = new LakeTable(spark, tmpDir("incr"), defaultBuckets = 8, ApplyMode.MergeOnRead)
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      (0 until 3).foreach { i =>
        t.merge(wal.where(col("lsn").between(i * 2000 + 1, (i + 1) * 2000)), "i", i.toLong)
      }
      val allFiles = t.currentSnapshot().get.files.size
      val scanned = t.filesForLsnRange(4001).size
      assert(scanned < allFiles, s"file-level skipping: $scanned of $allFiles")

      val changed = t.readChangedSince(4001)
      assert(changed.agg(min("lsn")).collect().head.getLong(0) >= 4001)
      // every key reported has its LATEST version (cross-check vs full read)
      val full = t.readResolved().where(col("lsn") >= 4001)
        .select("repo", "path", "commit").collect().map(_.toSeq).toSet
      val got = changed.select("repo", "path", "commit").collect().map(_.toSeq).toSet
      assert(got == full)
    } finally wal.unpersist()
  }

  test("ledger counts stale (late, at-or-below-hwm) events without corrupting state") {
    val t = new LakeTable(spark, tmpDir("stale"), defaultBuckets = 8, ApplyMode.CopyOnWrite)
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      t.merge(wal.where(col("lsn") <= 4000), "s", 0L)
      // replay an OLD slice as a new batch: all events are stale
      t.merge(wal.where(col("lsn").between(1000, 2000)), "s", 1L)
      t.merge(wal.where(col("lsn") > 4000), "s", 2L)
      val entries = t.ledger.entries()
      assert(entries.size == 3)
      val e1 = entries.find(_.contains("\"batchId\":1")).get
      assert(e1.contains("\"staleRows\":1001"), e1)
      assert(e1.contains("\"batchRows\":1001"), e1)
      // final state identical to clean replay
      val oracle = {
        val evs = wal.collect().toSeq.map(r => OracleApplier.Ev(
          r.getAs[Long]("lsn"), r.getAs[String]("op"), r.getAs[String]("repo"),
          r.getAs[String]("path"), r.getAs[String]("commit"), r.getAs[String]("content")))
        OracleApplier.liveRows(evs)
      }
      val got = t.read().select("repo", "path", "commit", "lang", "contentSha").collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))).sorted
      assert(got == oracle)
    } finally wal.unpersist()
  }

  test("streaming windowed op-counts with watermark (stateful agg, append mode)") {
    val walDir = tmpDir("mwal")
    ChangeLogGen.writeWal(spark, cfg, walDir, segments = 4)
    val q = MetricsStream.runToMemory(spark, walDir, "wal_metrics", tmpDir("mcp"))
    q.awaitTermination()
    val out = spark.sql("SELECT * FROM wal_metrics")
    // 6000 events at 1/sec from a fixed epoch = ~2 hours → at least the
    // first finalized window × up to 3 ops must be present
    assert(out.count() > 0)
    val batch = spark.read.parquet(walDir)
    assert(out.agg(sum("n")).collect().head.getLong(0) <= 6000)
    // per-op totals of FINALIZED windows match a batch recount
    val finalized = out.select("window_start").distinct().collect().map(_.get(0)).toSet
    val recount = batch
      .groupBy(window(col("ts"), "1 hour").as("w"), col("op"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("op"), col("n"))
      .where(col("window_start").isInCollection(finalized.toSeq))
      .collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = out.collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == recount)
  }

  test("streaming SLIDING windows: finalized windows match a batch recount") {
    val walDir = tmpDir("swal")
    ChangeLogGen.writeWal(spark, cfg, walDir, segments = 4)
    val q = MetricsStream.windowedOpCounts(spark, walDir, "1 hour", "30 minutes",
        slide = Some("30 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("wal_metrics_slide")
      .option("checkpointLocation", tmpDir("scp"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.sql("SELECT * FROM wal_metrics_slide")
    assert(out.count() > 0)
    val finalized = out.select("window_start").distinct().collect().map(_.get(0)).toSet
    val recount = spark.read.parquet(walDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("op"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("op"), col("n"))
      .where(col("window_start").isInCollection(finalized.toSeq))
      .collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = out.collect().map(r => (r.get(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == recount)
  }

  test("reopening a table with different constructor params keeps the stored layout") {
    val dir = tmpDir("reopen")
    val t = new LakeTable(spark, dir, defaultBuckets = 8, ApplyMode.MergeOnRead)
    val wal = ChangeLogGen.changeLog(spark, GenConfig(seed = 30, events = 1000, repos = 5, filesPerRepo = 8))
    t.merge(wal, "r", 0L)
    // misconfigured reopen: different bucket count AND mode
    val wrong = new LakeTable(spark, dir, defaultBuckets = 64, ApplyMode.CopyOnWrite)
    assert(wrong.nBuckets == 8, "bucket count comes from the snapshot")
    assert(wrong.mode == ApplyMode.MergeOnRead, "mode comes from the snapshot")
    wrong.merge(wal.where(col("lsn") <= 500), "r", 1L) // stale replay through the wrong handle
    val a = collectSorted(t.read().select("repo", "path", "commit"))
    val b = collectSorted(wrong.read().select("repo", "path", "commit"))
    assert(a == b, "no duplicate keys / lost rows after misconfigured reopen")
  }
}
