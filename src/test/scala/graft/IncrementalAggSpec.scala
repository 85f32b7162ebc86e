package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.stream.IncrementalAgg
import graft.table.{ApplyMode, LakeTable}

/** Incremental aggregate MV maintained from the FULL change feed: after
  * every batch the MV must equal the full recompute over the upstream
  * live rows — exactly, not eventually. The update algebra (post − pre,
  * minus old values on delete) is what the before-images exist for.
  */
class IncrementalAggSpec extends SparkSpec {

  private def ev(rows: (Long, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (l, op, p, c) =>
      (l, op, "r1", p, f"c$l%03d", if (op == "D") null else c)
    }.toDF("lsn", "op", "repo", "path", "commit", "content")
  }

  /** recompute oracle over the upstream live rows */
  private def recompute(t: LakeTable, group: org.apache.spark.sql.Column) =
    t.read().select(group.cast("string").as("group"),
        coalesce(length(col("content")).cast("long"), lit(0L)).as("m"))
      .groupBy("group").agg(count(lit(1)).as("cnt"), sum("m").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def mvSet(agg: IncrementalAgg) =
    agg.read().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("exact after every batch: groups move, drain to zero, resurrect") {
    val tag = "iagg1"
    // group = first content char — an UPDATE that changes it MOVES the key
    // across groups, the case that is unfixable without before-images
    val group = substring(col("content"), 1, 1)
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.MergeOnRead, defaultCdfFull = true)
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), group, length(col("content")))
    val batches = Seq(
      ev((1, "I", "a", "Apple"), (2, "I", "b", "Berry"), (3, "I", "c", "Basil")),
      ev((4, "U", "a", "Banana")), // moves a: group A -> B (A drains to zero)
      ev((5, "D", "b", null), (6, "U", "c", "Cress")), // B loses old Berry; B->C move
      ev((7, "I", "d", "Avocado")), // group A resurrects
      ev((8, "D", "x", null)) // delete of a never-live key: must contribute nothing
    )
    batches.zipWithIndex.foreach { case (b, i) =>
      t.merge(b, tag, i.toLong)
      agg.applyOnce(t, s"$tag-mv")
      assert(mvSet(agg) == recompute(t, group), s"MV must match recompute after batch $i")
    }
    // zero-count groups are tombstoned, not lingering at cnt=0
    assert(!mvSet(agg).exists(_._2 == 0L))
    // idempotence: re-applying at the same head is a no-op commit-wise
    val v = agg.mv.currentSnapshot().get.version
    agg.applyOnce(t, s"$tag-mv")
    assert(agg.mv.currentSnapshot().get.version == v)
  }

  test("post-only upstream is refused (before-images are load-bearing)") {
    val tag = "iagg2"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.CopyOnWrite, defaultCdf = true)
    t.merge(ev((1, "I", "a", "A1"), (2, "U", "a", "A2")), tag, 0)
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), col("lang"), length(col("content")))
    val e = intercept[IllegalArgumentException] { agg.applyOnce(t, s"$tag-mv") }
    assert(e.getMessage.contains("before-images"))
  }

  test("seed + incremental from mid-history (full feed enabled later)") {
    val tag = "iagg3"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.CopyOnWrite, defaultCdf = true)
    t.merge(ev((1, "I", "a", "Apple"), (2, "I", "b", "Berry")), tag, 0)
    t.enableChangeDataFeed(full = true) // preimage floor = hwm = 2
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), col("lang"), length(col("content")))
    agg.seed(t, s"$tag-mv") // full recompute at the floor
    assert(mvSet(agg) == recompute(t, col("lang")))
    t.merge(ev((3, "U", "a", "Apricots"), (4, "D", "b", null)), tag, 1)
    agg.applyOnce(t, s"$tag-mv") // incremental past the seed
    assert(mvSet(agg) == recompute(t, col("lang")))
  }

  test("multi-metric MV: count + sum + sum-of-squares stay exact (variance-ready)") {
    val tag = "iaggm"
    val len = length(col("content")).cast("long")
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.CopyOnWrite, defaultCdfFull = true)
    val agg = IncrementalAgg.multi(spark, tmpDir(s"$tag-mv"), col("lang"),
      Seq("total" -> len, "sq" -> (len * len)))
    val batches = Seq(
      ev((1, "I", "a.py", "Apple"), (2, "I", "b.py", "Berry"), (3, "I", "c.md", "Basil")),
      ev((4, "U", "a.py", "Banana"), (5, "D", "b.py", null)),
      ev((6, "I", "d.md", "Avocado"), (7, "D", "c.md", null)))
    batches.zipWithIndex.foreach { case (b, i) =>
      t.merge(b, tag, i.toLong)
      agg.applyOnce(t, s"$tag-mv")
      val expect = t.read().groupBy(col("lang").as("group"))
        .agg(count(lit(1)).as("cnt"), sum(len).as("total"), sum(len * len).as("sq"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val got = agg.read().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expect, s"batch $i: multi-metric MV must equal recompute")
    }
  }

  test("null group keys keep their state across folds (null-safe state join)") {
    val tag = "iaggz"
    val c1 = substring(col("content"), 1, 1)
    val group = when(c1 === "Z", lit(null).cast("string")).otherwise(c1)
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.CopyOnWrite, defaultCdfFull = true)
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), group, length(col("content")))
    val batches = Seq(
      ev((1, "I", "a", "Zeta"), (2, "I", "b", "Apple")),   // null group appears
      ev((3, "I", "c", "Zulu")),                           // null group must ACCUMULATE
      ev((4, "D", "a", null)))                             // and decrement exactly
    batches.zipWithIndex.foreach { case (b, i) =>
      t.merge(b, tag, i.toLong)
      agg.applyOnce(t, s"$tag-mv")
      assert(mvSet(agg) == recompute(t, group),
        s"batch $i: null-group state must survive the fold")
    }
  }

  test("source pin: folding a different upstream into the same MV is refused") {
    val tag = "iaggs"
    val t1 = new LakeTable(spark, tmpDir(s"$tag-1"), 4, ApplyMode.CopyOnWrite, defaultCdfFull = true)
    val t2 = new LakeTable(spark, tmpDir(s"$tag-2"), 4, ApplyMode.CopyOnWrite, defaultCdfFull = true)
    t1.merge(ev((1, "I", "a", "Apple")), tag, 0)
    t2.merge(ev((1, "I", "a", "Berry")), tag, 0)
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), col("lang"), length(col("content")))
    agg.applyOnce(t1, s"$tag-mv")
    val before = mvSet(agg)
    val e = intercept[IllegalArgumentException] { agg.applyOnce(t2, s"$tag-mv") }
    assert(e.getMessage.contains("maintained from"))
    assert(mvSet(agg) == before, "the refused fold must not touch the MV")
  }

  test("MV state lookup is bucket-pruned to the delta groups' buckets") {
    val tag = "iaggb"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.CopyOnWrite, defaultCdfFull = true)
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), col("lang"), length(col("content")))
    t.merge(ev((1, "I", "a.py", "Apple"), (2, "I", "b.md", "Berry"),
      (3, "I", "c.rs", "Basil")), tag, 0)
    agg.applyOnce(t, s"$tag-mv")
    t.merge(ev((4, "U", "a.py", "Banana")), tag, 1) // touches ONE group (python)
    val changes = t.readChangesBetween(3, 4)
    val bs = agg.deltaBuckets(changes, agg.mv.currentSnapshot().get.nBuckets)
    assert(bs.size == 1, s"a one-group batch must touch exactly one MV bucket, got $bs")
    // and the pruned state read keeps untouched groups (in unread buckets) exact
    agg.applyOnce(t, s"$tag-mv")
    assert(mvSet(agg) == recompute(t, col("lang")), "pruned state read must stay exact")
  }

  test("CDC chaining: second-level MV maintained from the first MV's own full feed") {
    val tag = "iaggc"
    val len = length(col("content")).cast("long")
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.MergeOnRead, defaultCdfFull = true)
    // level 1: per-extension (cnt, total bytes), publishing its own full feed
    val g1 = substring_index(col("path"), ".", -1)
    val mv1 = IncrementalAgg(spark, tmpDir(s"$tag-mv1"), g1, len, mvCdfFull = true)
    // level 2: per extension-initial shard, maintained ONLY from mv1's feed —
    // counts live groups, sums their row counts and byte totals. MV rows have
    // null content, so liveness of a before-image is its old cnt.
    val mv2 = IncrementalAgg.multi(spark, tmpDir(s"$tag-mv2"),
      substring(col("repo"), 1, 1), Seq("rows" -> col("cnt"), "bytes" -> col("total")),
      beforeLive = coalesce(col("cnt") > lit(0L), lit(false)))
    def expect = {
      val lvl1 = t.read().select(g1.cast("string").as("g"), coalesce(len, lit(0L)).as("m"))
        .groupBy("g").agg(count(lit(1)).as("c"), sum("m").as("t"))
      lvl1.groupBy(substring(col("g"), 1, 1).as("shard"))
        .agg(count(lit(1)).as("cnt"), sum("c").as("rows"), sum("t").as("bytes"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    val batches = Seq(
      ev((1, "I", "a.py", "Apple"), (2, "I", "b.py", "Berry"),
         (3, "I", "c.md", "Basil"), (4, "I", "e.pxt", "Cedar")),
      ev((5, "U", "a.py", "Banana"), (6, "D", "b.py", null)), // py shrinks (pre+post images)
      ev((7, "D", "a.py", null)),                             // py drains -> mv1 DELETE row
      ev((8, "I", "d.py", "Avocado"), (9, "U", "c.md", "Citrus"))) // py resurrects
    batches.zipWithIndex.foreach { case (b, i) =>
      t.merge(b, tag, i.toLong)
      mv1.applyOnce(t, s"$tag-mv1")
      mv2.applyOnce(mv1.mv, s"$tag-mv2")
      val got = mv2.read("shard").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expect, s"batch $i: chained MV must equal two-level recompute")
    }
    // the chain is incremental end-to-end: re-applying at the same head is a no-op
    val v = mv2.mv.currentSnapshot().get.version
    mv2.applyOnce(mv1.mv, s"$tag-mv2")
    assert(mv2.mv.currentSnapshot().get.version == v)
  }

  test("plan shape: partial (map-side) delta aggregation, no nested-loop join") {
    val tag = "iaggp"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.MergeOnRead, defaultCdfFull = true)
    t.merge(ev((1, "I", "a", "Apple"), (2, "I", "b", "Berry")), tag, 0)
    t.merge(ev((3, "U", "a", "Banana")), tag, 1)
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), col("lang"), length(col("content")))
    agg.applyOnce(t, s"$tag-mv")
    val events = agg.eventsFor(t.readChangesBetween(0))
    events.collect() // finalize the adaptive plan
    val p = events.queryExecution.executedPlan.toString
    // the delta reduction must combine map-side: two HashAggregate levels
    // (partial + final), so the shuffle moves one row per (partition,
    // group), never one per change row
    assert(p.contains("partial_sum") || p.contains("partial_"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    // the MV-state join must stay an equi-join (broadcast or shuffled —
    // AQE picks by runtime size), never a nested loop / cartesian
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("extrema MV: min/max exact across folds; bounded rescan only when an extremum is removed") {
    val tag = "iaggx"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.MergeOnRead, defaultCdfFull = true)
    val agg = IncrementalAgg.multi(spark, tmpDir(s"$tag-mv"), col("lang"),
      Seq("total" -> length(col("content"))),
      extrema = Seq(("min_len", length(col("content")), "min"),
                    ("max_len", length(col("content")), "max")))
    def oracle() = t.read().groupBy(col("lang").cast("string").as("g"))
      .agg(count(lit(1)).as("c"), sum(length(col("content")).cast("long")).as("s"),
        min(length(col("content")).cast("long")).as("mn"),
        max(length(col("content")).cast("long")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    def mvX() = agg.read().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val batches = Seq(
      ev((1, "I", "a", "aaaa"), (2, "I", "b", "bb"), (3, "I", "c", "cccccc")), // min 2, max 6
      ev((4, "I", "d", "x")),        // insert-only: min extends monotonically, NO rescan needed
      ev((5, "D", "b", null)),       // removes 2 > current min 1 — still no rescan needed
      ev((6, "D", "d", null)),       // removes the min itself -> bounded rescan -> min 4
      ev((7, "U", "a", "aaaaaaaaaa")), // preimage removes min 4 -> rescan min; max extends to 10
      ev((8, "U", "c", "ccc")),      // removes 6 (not max); min rescan -> 3
      ev((9, "I", "f", "fff")),      // tie: two rows at len 3
      ev((10, "D", "c", null))       // removes ONE of the tied minima -> rescan keeps min 3
    )
    batches.zipWithIndex.foreach { case (b, i) =>
      t.merge(b, tag, i.toLong)
      if (i == 1) {
        // an insert-only batch folds WITHOUT any rescan basis — proof the
        // rescan is gated on removed-extremum folds, not paid every time
        assert(agg.eventsFor(t.readChangesBetween(3L, 4L)).count() == 1)
      }
      agg.applyOnce(t, s"$tag-mv")
      assert(mvX() == oracle(), s"extrema MV must match recompute after batch $i")
    }
    // a removed-extremum batch REQUIRES the version-pinned basis: the raw
    // eventsFor path refuses loudly instead of writing a stale extremum
    t.merge(ev((11, "D", "a", null)), tag, 98L) // removes the max=10 row
    val e = intercept[IllegalStateException] {
      agg.eventsFor(t.readChangesBetween(10L, 11L))
    }
    assert(e.getMessage.contains("rescan"), e.getMessage)
    agg.applyOnce(t, s"$tag-mv")
    assert(mvX() == oracle())
    // extrema MVs fold via applyOnce only — the other fold surfaces refuse
    intercept[IllegalArgumentException] {
      agg.applyChanges(t.readChangesBetween(0L), s"$tag-mv", 99L)
    }
    intercept[IllegalArgumentException] {
      agg.stream(spark, t.root, s"$tag-mv", tmpDir(s"$tag-cp"))
    }
  }

  test("extrema rescan above the isin threshold: the left-semi path stays exact") {
    val tag = "iaggxj"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.MergeOnRead, defaultCdfFull = true)
    val agg = IncrementalAgg.multi(spark, tmpDir(s"$tag-mv"), col("lang"),
      Seq("total" -> length(col("content"))),
      extrema = Seq(("min_len", length(col("content")), "min"),
                    ("max_len", length(col("content")), "max")))
    def oracle() = t.read().groupBy(col("lang").cast("string").as("g"))
      .agg(count(lit(1)).as("c"), sum(length(col("content")).cast("long")).as("s"),
        min(length(col("content")).cast("long")).as("mn"),
        max(length(col("content")).cast("long")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    def mvX() = agg.read().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // two groups (python/markdown), two rows each
    t.merge(ev((1, "I", "a.py", "aa"), (2, "I", "b.py", "bbbb"),
      (3, "I", "c.md", "cccccc"), (4, "I", "d.md", "dd")), tag, 0L)
    agg.applyOnce(t, s"$tag-mv")
    assert(mvX() == oracle())
    // force EVERY flagged group through the semi-join rescan (threshold 0):
    // the delete removes python's stored min, the update's preimage removes
    // markdown's stored max — both groups flag, no driver-side isin
    spark.conf.set("spark.graft.mv.rescanIsinMax", "0")
    try {
      t.merge(ev((5, "D", "a.py", null), (6, "U", "c.md", "c")), tag, 1L)
      agg.applyOnce(t, s"$tag-mv")
      assert(mvX() == oracle(), "semi-join rescan path must equal the recompute")
    } finally spark.conf.unset("spark.graft.mv.rescanIsinMax")
  }

  test("single-maintainer pin: a second cpId errors, takeOver transfers") {
    val tag = "iaggcp"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.MergeOnRead, defaultCdfFull = true)
    t.merge(ev((1, "I", "a", "Apple"), (2, "I", "b", "Berry")), tag, 0)
    val mvDir = tmpDir(s"$tag-mv")
    def mk() = IncrementalAgg(spark, mvDir, col("lang"), length(col("content")))
    val a = mk()
    a.applyOnce(t, "maintainer-a")
    assert(mvSet(a) == recompute(t, col("lang")))
    // the race the pin closes: replay-idempotency is (cpId, batchId)-scoped,
    // so maintainer B folding the same delta under its own cpId would
    // double-count — it must ERROR at the fold boundary instead
    t.merge(ev((3, "U", "a", "Banana")), tag, 1)
    val b = mk()
    val e = intercept[IllegalArgumentException] { b.applyOnce(t, "maintainer-b") }
    assert(e.getMessage.contains("maintained under cpId 'maintainer-a'"), e.getMessage)
    // the failed maintainer changed nothing; the pinned one still folds
    a.applyOnce(t, "maintainer-a")
    assert(mvSet(a) == recompute(t, col("lang")), "MV equals the recompute after the race")
    // planned migration: takeOver re-pins, then the NEW cpId folds (cursor
    // is MV-state-derived, so no replay under the fresh committed-set)
    b.takeOver("maintainer-b")
    t.merge(ev((4, "D", "b", null)), tag, 2)
    b.applyOnce(t, "maintainer-b")
    assert(mvSet(b) == recompute(t, col("lang")))
    intercept[IllegalArgumentException] { a.applyOnce(t, "maintainer-a") }
  }

  test("streaming maintenance at gen scale: multi-trigger, restart-safe") {
    val cfg = GenConfig(seed = 55, events = 3000, repos = 6, filesPerRepo = 8)
    val tag = "iagg4"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.MergeOnRead, defaultCdfFull = true)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    (0 until 3).foreach { i =>
      t.merge(wal.where(col("lsn").between(i * 1000 + 1, (i + 1) * 1000)), tag, i.toLong)
    }
    val agg = IncrementalAgg(spark, tmpDir(s"$tag-mv"), col("repo"), length(col("content")))
    val cp = tmpDir(s"$tag-cp")
    // 500-lsn admission => ≥6 micro-batches over the 3000-lsn history
    val q = agg.stream(spark, t.root, s"$tag-mv", cp, maxLsnsPerTrigger = Some(500L))
    q.awaitTermination()
    assert(mvSet(agg) == recompute(t, col("repo")))
    // restart the stream on the same checkpoint after MORE upstream commits:
    // only the delta is applied, no double counting of the drained range
    t.merge(wal.where(col("lsn").between(3001, 3000 + 500)), tag, 3L)
    val q2 = agg.stream(spark, t.root, s"$tag-mv", cp, maxLsnsPerTrigger = Some(500L))
    q2.awaitTermination()
    assert(mvSet(agg) == recompute(t, col("repo")))
  }
}
