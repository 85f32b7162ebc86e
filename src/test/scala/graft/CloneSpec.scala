package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, LakeTable}

/** SHALLOW CLONE: zero-copy branching. The clone reads identically to the
  * cloned version without copying a byte, diverges independently, carries
  * schema/constraints/exactly-once state, localizes under compaction, and
  * its own retention can never reclaim source-owned files.
  */
class CloneSpec extends SparkSpec {

  val cfg = GenConfig(seed = 77, events = 6000, repos = 12, filesPerRepo = 15)

  private def stateOf(t: LakeTable) =
    collectSorted(t.read().select("repo", "path", "commit", "contentSha"))

  private def dataFiles(root: String): Seq[String] = {
    val d = java.nio.file.Paths.get(root, "data")
    if (!java.nio.file.Files.exists(d)) Nil
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet")).map(_.toString).toSeq
    }
  }

  for (mode <- Seq(ApplyMode.CopyOnWrite, ApplyMode.MergeOnRead, ApplyMode.DeletionVector)) {
    test(s"clone reads the cloned version zero-copy and diverges independently ($mode)") {
      val srcRoot = tmpDir(s"clsrc-$mode")
      val src = new LakeTable(spark, srcRoot, defaultBuckets = 4, mode)
      val wal = ChangeLogGen.changeLog(spark, cfg).persist()
      try {
        (0 until 4).foreach(i =>
          src.merge(wal.where(col("lsn").between(i * 1500 + 1, (i + 1) * 1500)), "cl", i.toLong))
        val srcHead = src.currentSnapshot().get
        if (mode == ApplyMode.DeletionVector)
          assert(srcHead.dvRows > 0, "fixture must carry live DVs")

        val cloneRoot = tmpDir(s"cldst-$mode")
        java.nio.file.Files.delete(java.nio.file.Paths.get(cloneRoot))
        src.cloneTo(cloneRoot, Some(2))
        val clone = new LakeTable(spark, cloneRoot)

        // zero-copy: not one data file under the clone's root
        assert(dataFiles(cloneRoot).isEmpty, "clone must not copy data files")
        assert(stateOf(clone) == collectSorted(
          src.readAt(2).select("repo", "path", "commit", "contentSha")),
          "clone reads exactly the cloned version")
        assert(clone.currentSnapshot().get.mode == srcHead.mode)

        // divergence: writes to the clone never touch the source
        clone.merge(wal.where(col("lsn").between(3001, 6000))
          .withColumn("content", concat(lit("clone!"), col("content"))), "cl2", 0L)
        assert(src.currentSnapshot().get.version == srcHead.version,
          "a clone write must not advance the source")
        assert(stateOf(src) == stateOf(new LakeTable(spark, srcRoot)), "source byte-unchanged")
        assert(clone.read().where(col("content").startsWith("clone!")).count() > 0)

        // exactly-once state carried: replaying a source-committed batch
        // against the clone is a detected no-op
        val vAfter = clone.currentSnapshot().get.version
        assert(clone.merge(wal.where(col("lsn").between(1, 1500)), "cl", 0L).isEmpty)
        assert(clone.currentSnapshot().get.version == vAfter)
      } finally wal.unpersist()
    }
  }

  test("compact localizes the clone; clone expiry never deletes source files") {
    val srcRoot = tmpDir("clloc-src")
    val src = new LakeTable(spark, srcRoot, defaultBuckets = 4, ApplyMode.MergeOnRead)
    val wal = ChangeLogGen.changeLog(spark, cfg).persist()
    try {
      (0 until 4).foreach(i =>
        src.merge(wal.where(col("lsn").between(i * 1500 + 1, (i + 1) * 1500)), "lc", i.toLong))
      val srcFiles = dataFiles(srcRoot).toSet
      val cloneRoot = tmpDir("clloc-dst")
      java.nio.file.Files.delete(java.nio.file.Paths.get(cloneRoot))
      src.cloneTo(cloneRoot, None)
      val clone = new LakeTable(spark, cloneRoot)
      val before = stateOf(clone)

      // v1 references source-absolute paths; compaction rewrites them local
      assert(clone.currentSnapshot().get.files.forall(f => !f.path.startsWith("data/")))
      clone.compact()
      val after = clone.currentSnapshot().get
      assert(after.files.forall(_.path.startsWith("data/")), "compact must localize")
      assert(stateOf(clone) == before)

      // expiry drops the v1 REFERENCES but not one source byte
      clone.expireSnapshots(keep = 1, emptyDirGraceMs = 0L)
      assert(dataFiles(srcRoot).toSet == srcFiles,
        "clone expiry deleted source-owned files")
      assert(stateOf(clone) == before && stateOf(src) == before)
    } finally wal.unpersist()
  }

  test("clone carries constraints and column mapping; refuses bad targets") {
    import spark.implicits._
    val srcRoot = tmpDir("clmeta-src")
    val src = new LakeTable(spark, srcRoot, defaultBuckets = 4, ApplyMode.CopyOnWrite)
    val ev = Seq((1L, "A", "r1", "a.py", "c1", "alpha"))
      .toDF("lsn", "op", "repo", "path", "commit", "content")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))
      .withColumn("score", lit(5))
    src.merge(ev, "cm", 0L)
    src.addConstraint("min_len", "length(content) >= 4")
    src.renameColumn("score", "points")
    val cloneRoot = tmpDir("clmeta-dst")
    java.nio.file.Files.delete(java.nio.file.Paths.get(cloneRoot))
    src.cloneTo(cloneRoot, None)
    val clone = new LakeTable(spark, cloneRoot)
    assert(clone.read().columns.contains("points"), "column mapping must ride the clone")
    val bad = intercept[Exception] {
      clone.merge(Seq((2L, "A", "r2", "b.rs", "c2", "no"))
        .toDF("lsn", "op", "repo", "path", "commit", "content")
        .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00"))), "cm2", 0L)
    }
    assert({ var c: Throwable = bad; var s = ""; while (c != null) { s += c.getMessage; c = c.getCause }; s }
      .contains("min_len"), "constraints must ride the clone")
    // refusals: existing dest, the source itself, an expired version
    intercept[Exception] { src.cloneTo(cloneRoot, None) }
    intercept[Exception] { src.cloneTo(srcRoot, None) }
    intercept[Exception] { src.cloneTo(tmpDir("clmeta-x") + "/t", Some(99)) }
  }

  test("SQL surface: CALL clone, then SELECT and DML on the clone") {
    val warehouse = tmpDir("clsql")
    val cat = "gclone"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"""CREATE TABLE $cat.src (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'mor', 'buckets' = '4')""")
    spark.sql(s"INSERT INTO $cat.src VALUES ('r1','a.py','c1',null,'alpha',null,1)")
    spark.sql(s"INSERT INTO $cat.src VALUES ('r2','b.rs','c2',null,'beta',null,2)")
    val res = spark.sql(s"CALL $cat.system.clone('src', 'branch')").collect().head
    assert(res.getString(0) == "branch" && res.getLong(3) == 2L)
    assert(collectSorted(spark.sql(s"SELECT repo, content FROM $cat.branch")) ==
      Seq(Seq("r1", "alpha"), Seq("r2", "beta")))
    spark.sql(s"INSERT INTO $cat.branch VALUES ('r1','a.py','c3',null,'alpha2',null,3)")
    assert(collectSorted(spark.sql(s"SELECT repo, content FROM $cat.branch")) ==
      Seq(Seq("r1", "alpha2"), Seq("r2", "beta")))
    assert(collectSorted(spark.sql(s"SELECT repo, content FROM $cat.src")) ==
      Seq(Seq("r1", "alpha"), Seq("r2", "beta")), "source untouched by clone DML")
  }
}
