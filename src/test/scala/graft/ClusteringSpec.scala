package graft

import org.apache.spark.sql.functions._

import graft.table.{ApplyMode, LakeTable}

/** Persisted clustering policy: once set, EVERY compaction — full,
  * targeted, and maybeCompact's automatic folds — lays buckets out
  * value-sorted, so the clustered layout survives maintenance instead of
  * silently reverting to key-sorted one hot bucket at a time. Stored
  * under physical names (rename-proof); drop of a clustered column is
  * refused; results never change.
  */
class ClusteringSpec extends SparkSpec {
  private lazy val sq = spark
  import sq.implicits._

  private val exts = Seq("py", "rs", "go", "js")

  private def build(root: String, mode: ApplyMode.Value): LakeTable = {
    val t = new LakeTable(spark, root, defaultBuckets = 2, mode)
    (0 until 4).foreach { i =>
      val rows = (0 until 80).map(j =>
        ("main", f"f${i * 80 + j}%03d.${exts(j % 4)}", s"c$i", s"body-$i-$j", i * 1000L + j))
      t.merge(rows.toDF("repo", "path", "commit", "content", "lsn")
        .withColumn("op", lit("U")), "cls", i.toLong)
    }
    t
  }

  private def stateOf(t: LakeTable) =
    collectSorted(t.read().select("repo", "path", "commit", "contentSha"))

  test("policy persists across data commits and drives no-arg compact()") {
    val t = build(tmpDir("clus"), ApplyMode.MergeOnRead)
    t.setClustering(Seq("lang"))
    // the policy must survive an ordinary data commit (explicit-constructor pin)
    t.merge(Seq(("main", "zzz.go", "cx", "late", 99999L))
      .toDF("repo", "path", "commit", "content", "lsn")
      .withColumn("op", lit("U")), "cls", 4L)
    assert(t.currentSnapshot().get.clusterBy == Seq("lang"))
    val before = stateOf(t)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "40")
    try t.compact() finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val snap = t.currentSnapshot().get
    assert(snap.files.forall(!_.sorted), "policy-driven compact must cluster")
    assert(stateOf(t) == before, "clustering never changes results")
    // the layout pays off: a lang lookup prunes files via evidence
    val df = spark.read.format("graft").load(t.root).where(col("lang") === "go")
    val planned = df.queryExecution.executedPlan
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.scan.asInstanceOf[graft.sources.GraftScan].planInputPartitions()
      .map(_.asInstanceOf[graft.sources.GraftInputPartition].files.size).sum
    assert(planned < snap.files.size, s"clustered layout must prune: $planned/${snap.files.size}")
  }

  test("automatic targeted folds preserve the clustered layout") {
    val t = build(tmpDir("clusAuto"), ApplyMode.MergeOnRead)
    t.setClustering(Seq("lang"))
    t.compact()
    // stack a delta chain on one key's bucket, then let maintenance fold it
    (0 until 4).foreach { i =>
      t.merge(Seq(("main", "f000.py", s"d$i", s"hot-$i", 200000L + i))
        .toDF("repo", "path", "commit", "content", "lsn")
        .withColumn("op", lit("U")), "hot", i.toLong)
    }
    val before = stateOf(t)
    assert(t.maybeCompact(maxFilesPerBucket = 2), "auto-fold must trigger")
    val snap = t.currentSnapshot().get
    assert(snap.files.forall(!_.sorted),
      "maybeCompact must not revert a clustered table to key-sorted")
    assert(stateOf(t) == before)
  }

  test("rename-proof (physical names); drop of a clustered column refused; clear works") {
    val t = new LakeTable(spark, tmpDir("clusMeta"), defaultBuckets = 2, ApplyMode.CopyOnWrite)
    t.merge(Seq((1L, "U", "r1", "a.py", "c1", "alpha"))
      .toDF("lsn", "op", "repo", "path", "commit", "content")
      .withColumn("branch", lit("main")), "cm", 0L)
    t.setClustering(Seq("branch"))
    t.renameColumn("branch", "ref")
    assert(t.currentSnapshot().get.clusterBy == Seq("branch"),
      "policy keyed on the physical name survives the rename")
    val d = intercept[Exception] { t.dropColumn("ref") }
    assert(d.getMessage.contains("clustering policy"))
    t.compact() // policy still resolves post-rename
    t.setClustering(Nil)
    assert(t.currentSnapshot().get.clusterBy.isEmpty)
    t.dropColumn("ref") // clear re-opens the drop
    intercept[Exception] { t.setClustering(Seq("no_such")) }
  }

  test("SQL surface: CALL set_clustering; DESCRIBE DETAIL shows logical names") {
    val warehouse = tmpDir("clusSql")
    val cat = "gclus"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    // declaratively clustered from creation via TBLPROPERTIES
    spark.sql(s"""CREATE TABLE $cat.t (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'mor', 'buckets' = '2', 'clusterBy' = 'contentSha')""")
    assert(new LakeTable(spark, s"$warehouse/t").currentSnapshot().get.clusterBy ==
      Seq("contentSha"))
    spark.sql(s"INSERT INTO $cat.t VALUES ('r1','a.py','c1',null,'alpha',null,1)")
    // set_clustering replaces the creation-time policy
    val res = spark.sql(s"CALL $cat.system.set_clustering('t', 'lang')").collect().head
    assert(res.getString(0) == "lang")
    val detail = spark.sql(s"CALL $cat.system.describe_detail('t')").collect().head
    assert(detail.getAs[String]("cluster_by") == "lang")
    spark.sql(s"CALL $cat.system.compact('t')")
    assert(new LakeTable(spark, s"$warehouse/t").currentSnapshot().get.files.forall(!_.sorted))
  }
}
