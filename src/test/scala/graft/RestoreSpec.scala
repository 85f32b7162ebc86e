package graft

import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, LakeTable}

/** RESTORE: zero-copy rollback of the table's data state to a retained
  * snapshot, CDC-correct under the change feed (the commit carries the
  * keyed head→restored diff, like a replace).
  */
class RestoreSpec extends SparkSpec {

  val cfg = GenConfig(seed = 61, events = 8000, repos = 15, filesPerRepo = 20)

  private def build(root: String, mode: ApplyMode.Value, cdf: Boolean = false): LakeTable = {
    val t = new LakeTable(spark, root, 4, mode, defaultCdf = cdf)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    (0 until 4).foreach(i =>
      t.merge(wal.where(col("lsn").between(i * 2000 + 1, (i + 1) * 2000)), "rs", i.toLong))
    t
  }

  private def state(t: LakeTable) =
    collectSorted(t.read().select("repo", "path", "commit", "contentSha"))

  test("restore rolls data back zero-copy; history and bookkeeping survive") {
    val t = build(tmpDir("rest"), ApplyMode.CopyOnWrite)
    val snap4 = t.currentSnapshot().get
    val atV2 = collectSorted(t.readAt(2).select("repo", "path", "commit", "contentSha"))
    assert(atV2 != state(t), "fixture must change between v2 and head")

    t.restore(2)
    val snap5 = t.currentSnapshot().get
    assert(snap5.version == snap4.version + 1)
    // zero-copy: the restored commit REFERENCES old files verbatim — the
    // restore commit itself wrote no data
    assert(snap5.files.nonEmpty &&
      snap5.files.forall(f => !f.path.contains(s"c${snap5.version}-")),
      "restore must not write data files")
    assert(state(t) == atV2, "restored state must equal the v2 read")
    // bookkeeping survives: hwm and exactly-once ids are not forgotten
    assert(snap5.hwm == snap4.hwm)
    assert((0L until 4L).forall(b => snap5.isCommitted("rs", b)))
    // time travel still serves the rolled-back-over versions
    assert(collectSorted(t.readAt(4).select("repo", "path", "commit", "contentSha"))
      == collectSorted(spark.read.format("graft").option("snapshot", 4).load(t.root)
        .select("repo", "path", "commit", "contentSha")))
    // a merge AFTER the restore applies on top of the restored state
    val extra = ChangeLogGen.changeLog(spark, cfg.copy(seed = 62, events = 500))
    t.merge(extra, "rs2", 0L)
    val ref = new LakeTable(spark, tmpDir("restref"), 4, ApplyMode.CopyOnWrite)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    ref.merge(wal.where(col("lsn") <= 4000), "ref", 0L)
    ref.merge(extra, "ref", 1L)
    assert(state(t) == state(ref), "post-restore merges must fold onto the restored state")
  }

  test("restore under the change feed: tails fold the rollback exactly") {
    val t = build(tmpDir("restcdf"), ApplyMode.MergeOnRead, cdf = true)
    val before = t.currentSnapshot().get
    t.restore(2)
    val snap = t.currentSnapshot().get
    assert(snap.cdfSinceLsn == before.cdfSinceLsn, "coverage must stay continuous")
    assert(snap.hwm == before.hwm + 1, "the diff is stamped one past the hwm")
    // replaying the whole feed converges to the RESTORED state — downstream
    // MVs and replicas fold the rollback instead of diverging
    val replica = t.readChangedSince(1L)
    assert(collectSorted(replica.where(!col("deleted"))
        .select("repo", "path", "contentSha")) ==
      collectSorted(t.read().select("repo", "path", "contentSha")))
    // the restore commit's own rows carry the synthetic restore stamp
    val diff = t.readChangesBetween(before.hwm)
    assert(diff.count() > 0, "a state-changing restore must emit change rows")
    assert(diff.select("commit").distinct().collect()
      .forall(_.getString(0).startsWith("!restore-")))
  }

  test("restore refuses reclaimed versions and no-ops on the head") {
    val t = build(tmpDir("restgone"), ApplyMode.CopyOnWrite)
    val headV = t.currentSnapshot().get.version
    t.restore(headV) // no-op
    assert(t.currentSnapshot().get.version == headV)
    t.compact() // v5: rewrites everything; v1's files now unreferenced
    t.expireSnapshots(keep = 1)
    t.vacuumOrphans(olderThanMs = 0L)
    val e = intercept[IllegalArgumentException](t.restore(2))
    assert(e.getMessage.contains("expired") || e.getMessage.contains("reclaimed"), e.getMessage)
  }

  test("restore through SQL: CALL g.system.restore") {
    val root = tmpDir("restsql")
    build(s"$root/t", ApplyMode.CopyOnWrite)
    spark.conf.set("spark.sql.catalog.grst", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grst.root", root)
    val r = spark.sql("CALL grst.system.restore('t', 2)").collect().head
    assert(r.getInt(0) == 5 && r.getInt(1) == 2)
    val t = new LakeTable(spark, s"$root/t")
    assert(state(t) == collectSorted(t.readAt(2).select("repo", "path", "commit", "contentSha")))
  }
}
