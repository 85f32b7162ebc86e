package graft

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, Catalog}

/** Multi-tenant catalog: isolated tables, persisted properties, SQL views. */
class CatalogSpec extends SparkSpec {

  test("full maintenance cycle through SQL only: CALL procedures + DESCRIBE HISTORY") {
    import org.apache.spark.sql.functions.col
    val warehouse = tmpDir("catproc")
    val cat = "gproc"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"""CREATE TABLE $cat.m (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'mor', 'buckets' = '4')""")
    spark.sql(s"INSERT INTO $cat.m VALUES ('r1','a.py','c1',null,'alpha',null,1)")
    spark.sql(s"INSERT INTO $cat.m VALUES ('r1','a.py','c2',null,'alpha2',null,2)")
    spark.sql(s"INSERT INTO $cat.m VALUES ('r2','b.rs','c3',null,'beta',null,3)")
    val t = new graft.table.LakeTable(spark, s"$warehouse/m")
    val filesBefore = t.currentSnapshot().get.files.size
    assert(filesBefore > 2, "mor inserts must stack deltas")

    // the discovery surface: SHOW PROCEDURES lists the maintenance set
    val listed = spark.sql(s"SHOW PROCEDURES IN $cat").collect().map(_.toSeq.mkString("."))
    assert(graft.sources.GraftProcedures.names.forall(n => listed.exists(_.contains(n))),
      s"SHOW PROCEDURES missing entries: $listed")

    // compact folds the deltas; row state unchanged
    val c = spark.sql(s"CALL $cat.system.compact('m')").collect().head
    assert(c.getInt(1) == filesBefore && c.getInt(2) < filesBefore)
    assert(collectSorted(t.read().select("repo", "path", "content")) ==
      Seq(Seq("r1", "a.py", "alpha2"), Seq("r2", "b.rs", "beta")))

    // rebucket re-keys the layout
    val rb = spark.sql(s"CALL $cat.system.rebucket('m', 8)").collect().head
    assert(rb.getInt(0) == 8 && t.currentSnapshot().get.nBuckets == 8)

    // CDF lifecycle: enable, change, expire consumed range
    spark.sql(s"CALL $cat.system.enable_change_data_feed('m')")
    spark.sql(s"INSERT INTO $cat.m VALUES ('r2','b.rs','c4',null,'beta2',null,4)")
    assert(t.currentSnapshot().get.cdfFiles.nonEmpty, "post-enable commit writes a sidecar")
    val ex = spark.sql(s"CALL $cat.system.expire_change_feed('m', 4)").collect().head
    assert(ex.getInt(0) == 1 && ex.getLong(1) == 4L)

    // feed compaction folds sidecars through SQL (below-target = no-op here)
    val fold = spark.sql(s"CALL $cat.system.compact_change_feed('m', 1)").collect().head
    assert(fold.getInt(1) <= math.max(fold.getInt(0), 1))

    // backfill re-covers the pre-enablement (and just-expired) range from
    // the surviving data: floor drops to 0 and batch table_changes serves
    // the full history — walk fidelity (compaction collapsed r1's first
    // version, so its survivor types as one insert)
    val bf = spark.sql(s"CALL $cat.system.backfill_change_feed('m')").collect().head
    assert(bf.getInt(0) > 0 && bf.getLong(1) == 0L)
    val typedRows = spark.read.format("graft").option("changeTypes", "true")
      .load(s"$warehouse/m")
      .select("repo", "path", "lsn", "_change_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(typedRows == Set(("r1", "a.py", 2L, "insert"), ("r2", "b.rs", 3L, "insert"),
      ("r2", "b.rs", 4L, "update_postimage")))

    // history: newest first, versions dense, commit times stamped
    val hist = spark.sql(s"CALL $cat.system.describe_history('m')")
    val versions = hist.select("version").collect().map(_.getInt(0)).toSeq
    assert(versions == versions.sorted.reverse && versions.head == t.currentSnapshot().get.version)
    assert(hist.where(col("commit_time").isNull).count() == 0, "all commits stamped")
    assert(hist.select("mode").head().getString(0) == "mor")

    // one-row table health: metadata-only, consistent with the snapshot
    val det = spark.sql(s"CALL $cat.system.describe_detail('m')").collect().head
    val snapD = t.currentSnapshot().get
    assert(det.getAs[Int]("version") == snapD.version)
    assert(det.getAs[String]("mode") == "mor" && det.getAs[Int]("buckets") == 8)
    assert(det.getAs[Long]("hwm") == snapD.hwm &&
      det.getAs[Long]("stored_rows") == snapD.totalRows)
    assert(det.getAs[Int]("files") == snapD.files.size &&
      det.getAs[Int]("max_files_per_bucket") >= 1)
    assert(det.getAs[String]("cdf") == "post" &&
      det.getAs[Int]("cdf_sidecars") == snapD.cdfFiles.size)
    assert(det.getAs[Int]("columns") ==
      org.apache.spark.sql.types.StructType.fromDDL(snapD.schemaDdl).size)
    // retention policies surface in DESCRIBE DETAIL: null when unset,
    // the active session values when set
    assert(det.isNullAt(det.fieldIndex("snapshots_retain")))
    spark.conf.set("spark.graft.snapshots.retain", "5")
    try {
      val det2 = spark.sql(s"CALL $cat.system.describe_detail('m')").collect().head
      assert(det2.getAs[Int]("snapshots_retain") == 5)
    } finally spark.conf.unset("spark.graft.snapshots.retain")

    // retention: keep 2 snapshots, orphan sweep runs clean
    spark.sql(s"CALL $cat.system.expire_snapshots('m', 2)")
    val kept = spark.sql(s"CALL $cat.system.describe_history('m')").count()
    assert(kept == 2, s"expected 2 retained snapshots, got $kept")
    assert(spark.sql(s"CALL $cat.system.vacuum_orphans('m', 0)").collect().head.getInt(0) >= 0)
    // table still serves after the full cycle
    assert(t.read().count() == 2)
  }

  test("pure-SQL incremental MV: CALL refresh_mv creates, folds, and guards its definition") {
    import org.apache.spark.sql.functions.col
    val warehouse = tmpDir("catmv")
    val cat = "gmv"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    // `score` is a DATA column: before-images preserve it, so it is a
    // valid MV metric (lsn/commit are re-stamped on preimages — CDC
    // bookkeeping, not foldable data)
    spark.sql(s"""CREATE TABLE $cat.src (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT, score BIGINT)
      TBLPROPERTIES ('mode' = 'cow', 'buckets' = '4', 'cdf' = 'full')""")
    spark.sql(s"INSERT INTO $cat.src VALUES ('r1','a.py','c1',null,'alpha',null,1,10)")
    spark.sql(s"INSERT INTO $cat.src VALUES ('r2','b.py','c2',null,'beta',null,2,20)")
    // first call creates the MV and folds everything so far
    val r1 = spark.sql(s"CALL $cat.system.refresh_mv('mv1', 'src', 'lang', 'score')")
      .collect().head
    assert(r1.getAs[Long]("mv_hwm") == 2L)
    // the MV is an ordinary catalog table — SELECT it by name
    def mvState() = spark.sql(s"SELECT repo, cnt, total FROM $cat.mv1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mvState() == Set(("python", 2L, 30L)))
    // incremental: a later change folds, an unchanged head is a no-op
    spark.sql(s"INSERT INTO $cat.src VALUES ('r1','a.py','c3',null,null,null,3,null)") // delete
    spark.sql(s"CALL $cat.system.refresh_mv('mv1', 'src', 'lang', 'score')")
    assert(mvState() == Set(("python", 1L, 20L)))
    // definition guard: a different group/metric set errors, never corrupts
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.refresh_mv('mv1', 'src', 'repo', 'score')").collect()
    }
    assert(e.getMessage.contains("different"), s"got: ${e.getMessage}")
    assert(mvState() == Set(("python", 1L, 20L)), "failed refresh must not change the MV")
    // expression-valued group/metric: a second MV over SQL expressions
    spark.sql(s"CALL $cat.system.refresh_mv('mv2', 'src', 'substring(repo, 1, 1)', 'score * 2')")
    val mv2 = spark.sql(s"SELECT repo, cnt, total FROM $cat.mv2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mv2 == Set(("r", 1L, 40L)), s"got: $mv2")
    // SQL-level CHAINING with NO explicit liveness argument: SQL MVs
    // publish their own full feed, and 'auto' (the before_live_expr
    // default) detects the MV source by its definition marker and applies
    // the MV liveness convention (old cnt > 0) by itself
    spark.sql(s"CALL $cat.system.refresh_mv('mv3', 'mv1', 'repo', 'total')")
    val mv3 = spark.sql(s"SELECT repo, cnt, total FROM $cat.mv3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mv3 == Set(("python", 1L, 20L)), s"got: $mv3")
    // ...and the resolved convention is pinned in the MV's definition, so a
    // later explicit call with the SAME expression folds compatibly
    spark.sql(s"""CALL $cat.system.refresh_mv('mv3', 'mv1', 'repo', 'total',
      'coalesce(cnt > 0, false)')""")
    // the auto liveness must be DISCRIMINATING: deleting the last python
    // row tombstones mv1's group, whose delete change carries old cnt=1 —
    // under the MV convention (cnt > 0) it decrements mv3 to empty; under
    // the content convention (MV rows have null content) it would be a
    // no-op and mv3 would still show python
    spark.sql(s"INSERT INTO $cat.src VALUES ('r2','b.py','c4',null,null,null,4,null)")
    spark.sql(s"CALL $cat.system.refresh_mv('mv1', 'src', 'lang', 'score')")
    assert(mvState() == Set.empty, "mv1 must tombstone the emptied group")
    spark.sql(s"CALL $cat.system.refresh_mv('mv3', 'mv1', 'repo', 'total')")
    val mv3b = spark.sql(s"SELECT repo, cnt FROM $cat.mv3").collect()
    assert(mv3b.isEmpty, s"auto liveness must propagate the delete, got: ${mv3b.mkString(",")}")
  }

  test("tenant tables are isolated, properties persist, views register") {
    val cat = new Catalog(spark, tmpDir("catalog"))
    val a = cat.table("tenant_a", nBuckets = 4, mode = ApplyMode.CopyOnWrite)
    val b = cat.table("tenant_b", nBuckets = 8, mode = ApplyMode.MergeOnRead)
    a.merge(ChangeLogGen.changeLog(spark, GenConfig(seed = 1, events = 500, repos = 4, filesPerRepo = 6)), "a", 0L)
    b.merge(ChangeLogGen.changeLog(spark, GenConfig(seed = 2, events = 700, repos = 4, filesPerRepo = 6)), "b", 0L)

    assert(cat.list() == Seq("tenant_a", "tenant_b"))
    assert(cat.properties("tenant_a")("rulesVersion") == graft.model.LangRules.version)
    // reopen with DIFFERENT defaults: properties win
    val b2 = cat.table("tenant_b", nBuckets = 64, mode = ApplyMode.CopyOnWrite)
    assert(b2.nBuckets == 8 && b2.mode == ApplyMode.MergeOnRead)
    // isolation: contents differ and views are queryable
    cat.createViews()
    val na = spark.sql("SELECT count(*) FROM tenant_a").collect().head.getLong(0)
    val nb = spark.sql("SELECT count(*) FROM tenant_b").collect().head.getLong(0)
    assert(na > 0 && nb > 0 && na != nb)
    // third apply mode persists through catalog properties too
    val c = cat.table("tenant_c", nBuckets = 4, mode = ApplyMode.DeletionVector)
    c.merge(ChangeLogGen.changeLog(spark, GenConfig(seed = 3, events = 400, repos = 3, filesPerRepo = 5)), "c", 0L)
    assert(cat.table("tenant_c", mode = ApplyMode.CopyOnWrite).mode == ApplyMode.DeletionVector)
    assert(cat.properties("tenant_c")("mode") == "dv")
  }
}
