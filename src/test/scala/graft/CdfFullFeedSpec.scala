package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, LakeTable}

/** FULL change data feed (Delta `table_changes` parity): with
  * `cdf = 'full'` the commit sidecars also carry BEFORE-IMAGES — one
  * `update_preimage` row per update (the old values, stamped with the NEW
  * change's (lsn, commit), Delta's convention) and `delete` rows carrying
  * the deleted row's old values instead of the tombstone's nulls. Typed
  * consumers (readChangesBetween / changeTypes tails) see them; untyped
  * consumers (changeFeed tails, readChangedSince) must NOT — a preimage
  * duplicates its update's (lsn, commit) with stale values.
  */
class CdfFullFeedSpec extends SparkSpec {

  /** (lsn, op, path, content) → a WAL event frame on repo "r1" */
  private def ev(rows: (Long, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (l, op, p, c) =>
      (l, op, "r1", p, f"c$l%03d", if (op == "D") null else c)
    }.toDF("lsn", "op", "repo", "path", "commit", "content")
  }

  /** I a, I b / U a, D b, I c / D a, I b — every full-feed shape in 7 lsns */
  private def build(mode: ApplyMode.Value, tag: String): LakeTable = {
    val t = new LakeTable(spark, tmpDir(tag), 4, mode, defaultCdfFull = true)
    t.merge(ev((1, "I", "a", "A1"), (2, "I", "b", "B1")), tag, 0)
    t.merge(ev((3, "U", "a", "A2"), (4, "D", "b", null), (5, "I", "c", "C1")), tag, 1)
    t.merge(ev((6, "D", "a", null), (7, "I", "b", "B2")), tag, 2)
    t
  }

  private def changeSet(t: LakeTable): Set[(String, Long, String, String, Boolean)] =
    t.readChangesBetween(0)
      .select("path", "lsn", "_change_type", "content", "deleted")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getBoolean(4)))
      .toSet

  private val expected = Set(
    ("a", 1L, "insert", "A1", false),
    ("b", 2L, "insert", "B1", false),
    ("a", 3L, "update_preimage", "A1", false),
    ("a", 3L, "update_postimage", "A2", false),
    ("b", 4L, "delete", "B1", true), // delete carries the OLD values
    ("c", 5L, "insert", "C1", false),
    ("a", 6L, "delete", "A2", true),
    ("b", 7L, "insert", "B2", false))

  for (m <- Seq(ApplyMode.CopyOnWrite, ApplyMode.MergeOnRead, ApplyMode.DeletionVector))
    test(s"full feed: preimages + old-value deletes, every change shape ($m)") {
      val t = build(m, s"cff$m")
      val snap = t.currentSnapshot().get
      assert(snap.cdfSinceLsn == 0L && snap.cdfFullSinceLsn == 0L,
        "defaultCdfFull must start both floors at 0")
      assert(changeSet(t) == expected)
      // the preimage's contentSha is the OLD row's, not a re-hash of nulls
      val preSha = t.readChangesBetween(0)
        .where(col("_change_type") === "update_preimage")
        .select("contentSha").collect().head.getString(0)
      assert(preSha == spark.sql("SELECT sha2('A1', 256)").first().getString(0))
    }

  test("untyped consumers never see preimages; state stays convergent") {
    val t = build(ApplyMode.MergeOnRead, "cffu")
    // batch incremental read: one winner per key, postimage values
    val ch = t.readChangedSince(1)
      .select("path", "lsn", "content", "deleted").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getBoolean(3))).toSet
    // the delete winner carries the OLD values (full-mode tombstones do —
    // strictly more information than nulls; liveness is the `deleted` flag)
    assert(ch == Set(("a", 6L, "A2", true), ("b", 7L, "B2", false), ("c", 5L, "C1", false)))
    // streaming untyped feed: exactly one row per change lsn, post values
    val q = spark.readStream.format("graft").option("changeFeed", "true").load(t.root)
      .select("path", "lsn", "content", "deleted")
      .writeStream.format("memory").queryName("cff_untyped")
      .option("checkpointLocation", tmpDir("cffu_cp"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("cff_untyped").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getBoolean(3)))
    assert(rows.length == 7, s"one delivery per change lsn, got ${rows.length}")
    assert(rows.toSet.contains(("a", 3L, "A2", false)),
      "the update must deliver its POSTimage on the untyped feed")
    // full-mode delete rows carry old values even on the untyped feed —
    // strictly more information than the tombstone's nulls
    assert(rows.toSet.contains(("b", 4L, "B1", true)))
  }

  test("enable(full) on a live post-feed: preimage floor = hwm at the upgrade") {
    val tag = "cffe"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.CopyOnWrite, defaultCdf = true)
    t.merge(ev((1, "I", "a", "A1"), (2, "U", "a", "A2")), tag, 0)
    assert(t.currentSnapshot().get.cdfFullSinceLsn == -1L)
    t.enableChangeDataFeed(full = true)
    assert(t.currentSnapshot().get.cdfFullSinceLsn == 2L,
      "preimage floor starts at the enabling instant's hwm")
    assert(t.currentSnapshot().get.cdfSinceLsn == 0L, "feed floor must NOT move")
    t.merge(ev((3, "U", "a", "A3")), tag, 1)
    val all = changeSet(t)
    // pre-upgrade range stays post-only (lsn 2's update has no preimage);
    // post-upgrade updates carry theirs — with the OLD value A2
    assert(!all.exists(r => r._2 == 2L && r._3 == "update_preimage"))
    assert(all.contains(("a", 3L, "update_preimage", "A2", false)))
    assert(all.contains(("a", 3L, "update_postimage", "A3", false)))
  }

  test("replace-CDC under the full feed: old values on the keyed diff") {
    val tag = "cffr"
    val t = new LakeTable(spark, tmpDir(tag), 4, ApplyMode.CopyOnWrite, defaultCdfFull = true)
    t.merge(ev((1, "I", "a", "A1"), (2, "I", "b", "B1")), tag, 0)
    t.overwrite(ev((10, "I", "b", "B9"), (11, "I", "c", "C9")), s"$tag-ow", 0)
    val d = t.readChangesBetween(2) // after the ingest range: just the replace event
    val dLsn = t.currentSnapshot().get.hwm
    val got = d.select("path", "lsn", "_change_type", "content", "deleted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getBoolean(4))).toSet
    assert(got == Set(
      ("a", dLsn, "delete", "A1", true), // vanished key: delete w/ OLD values
      ("b", dLsn, "update_preimage", "B1", false),
      ("b", dLsn, "update_postimage", "B9", false),
      ("c", dLsn, "insert", "C9", false)))

    // truncate: every live key deletes, old values carried
    val t2 = new LakeTable(spark, tmpDir(s"$tag-tr"), 4, ApplyMode.CopyOnWrite,
      defaultCdfFull = true)
    t2.merge(ev((1, "I", "a", "A1"), (2, "I", "b", "B1")), s"$tag-tr", 0)
    t2.truncate()
    val got2 = t2.readChangesBetween(2).select("path", "_change_type", "content").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got2 == Set(("a", "delete", "A1"), ("b", "delete", "B1")))
  }

  test("DML route: deleteWhere on a full-feed table emits old-value deletes") {
    val t = build(ApplyMode.CopyOnWrite, "cffdml")
    val hwm = t.currentSnapshot().get.hwm
    t.deleteWhere(col("path") === "b") // statement-derived tombstone at hwm+1
    val got = t.readChangesBetween(hwm).select("path", "_change_type", "content").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("b", "delete", "B2")),
      "a statement delete's change row must carry the victim's old values")
  }

  test("feed compaction preserves before-images") {
    val t = build(ApplyMode.MergeOnRead, "cffc")
    t.compactChangeFeed(targetFiles = 1)
    assert(t.currentSnapshot().get.cdfFiles.size == 1)
    assert(changeSet(t) == expected, "folding sidecars must not lose preimage rows")
  }

  test("SQL surface: TBLPROPERTIES cdf='full' and CALL enable_change_data_feed(t,'full')") {
    val warehouse = tmpDir("cffsql")
    val cat = "gcff"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"""CREATE TABLE $cat.f (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'cow', 'buckets' = '4', 'cdf' = 'full')""")
    spark.sql(s"INSERT INTO $cat.f VALUES ('r1','a.py','c1',null,'alpha',null,1)")
    spark.sql(s"INSERT INTO $cat.f VALUES ('r1','a.py','c2',null,'alpha2',null,2)")
    val t = new LakeTable(spark, s"$warehouse/f")
    assert(t.currentSnapshot().get.cdfFullSinceLsn == 0L)
    val pre = t.readChangesBetween(0)
      .where(col("_change_type") === "update_preimage").select("content", "lsn").collect()
    assert(pre.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("alpha", 2L)))

    // post-created table upgraded through the procedure; 1-arg CALL keeps
    // its default ('post') — the pre-existing shape must not break
    spark.sql(s"""CREATE TABLE $cat.p (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'cow', 'buckets' = '4')""")
    val r0 = spark.sql(s"CALL $cat.system.enable_change_data_feed('p')").collect().head
    assert(r0.getLong(0) == 0L && r0.getLong(1) == -1L, "default mode stays post-only")
    val r1 = spark.sql(s"CALL $cat.system.enable_change_data_feed('p', 'full')").collect().head
    assert(r1.getLong(1) >= 0L, "mode='full' starts the preimage floor")
  }

  test("gen-scale parity: full feed's post rows == post feed; preimages match the chain") {
    val cfg = GenConfig(seed = 91, events = 3000, repos = 6, filesPerRepo = 8)
    val batches = 3; val per = cfg.events / batches
    def gen(tag: String, full: Boolean, mode: ApplyMode.Value): LakeTable = {
      val t = new LakeTable(spark, tmpDir(tag), 4, mode,
        defaultCdf = !full, defaultCdfFull = full)
      val wal = ChangeLogGen.changeLog(spark, cfg)
      (0 until batches).foreach { i =>
        t.merge(wal.where(col("lsn").between(i * per + 1, (i + 1) * per)), tag, i.toLong)
      }
      t
    }
    def typed(t: LakeTable): Seq[(String, String, Long, String, String)] =
      t.readChangesBetween(0)
        .select("repo", "path", "lsn", "_change_type", "contentSha").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3),
          if (r.isNullAt(4)) null else r.getString(4))).toSeq
    for (mode <- Seq(ApplyMode.MergeOnRead, ApplyMode.DeletionVector)) {
      val full = typed(gen(s"cffg_f$mode", full = true, mode))
      val post = typed(gen(s"cffg_p$mode", full = false, mode)).toSet
      val (pres, posts) = full.partition(_._4 == "update_preimage")
      // full mode's only post-row difference: deletes carry the OLD sha
      // where the post feed carries the tombstone's null
      def shape(rs: Iterable[(String, String, Long, String, String)]) =
        rs.map(r => (r._1, r._2, r._3, r._4,
          if (r._4 == "delete") null else r._5)).toSet
      assert(shape(posts) == shape(post),
        s"$mode: full mode must not change the post-row set")
      // before-image values: each preimage (and each delete's old values)
      // must carry the key's IMMEDIATE chain predecessor's contentSha
      val byKey = posts.groupBy(r => (r._1, r._2))
      def predSha(repo: String, path: String, lsn: Long): String =
        byKey((repo, path)).filter(_._3 < lsn) match {
          case s if s.isEmpty => null
          case s =>
            val p = s.maxBy(_._3)
            if (p._4 == "delete") null else p._5
        }
      pres.foreach { case (repo, path, lsn, _, sha) =>
        assert(sha != null && predSha(repo, path, lsn) == sha,
          s"$mode: preimage at ($repo,$path,$lsn) must carry the predecessor's contentSha")
      }
      posts.filter(_._4 == "delete").foreach { case (repo, path, lsn, _, sha) =>
        assert(predSha(repo, path, lsn) == sha,
          s"$mode: delete at ($repo,$path,$lsn) must carry the OLD row's contentSha")
      }
      assert(pres.nonEmpty, s"$mode: the gen fixture must exercise updates")
    }
  }
}
