package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.table.{ApplyMode, LakeTable}

/** DSv2 write path: INSERT is an upsert-apply through the merge pipeline,
  * NULL content is a tombstone (Kafka log-compaction convention), derived
  * columns are recomputed, overwrite truncates, DELETE FROM goes through
  * the filter-delete surface, and every mode (cow/mor/dv) serves the same
  * final state.
  */
class GraftWriteSpec extends SparkSpec {

  val cfg = GenConfig(seed = 77, events = 3000, repos = 10, filesPerRepo = 12)

  /** WAL events in the table-schema shape a DSv2 writer presents (derived
    * columns deliberately wrong/null — the engine must recompute them;
    * deletes arrive as null content, same as the WAL itself encodes them).
    */
  private def tableShape(events: DataFrame): DataFrame =
    events.select(
      col("repo"), col("path"), col("commit"),
      lit("WRONG").as("lang"), col("content"),
      lit("untrusted").as("contentSha"), col("lsn"))

  private def stateOf(t: LakeTable): Seq[Seq[Any]] =
    collectSorted(t.read().select("repo", "path", "commit", "lang", "contentSha", "lsn"))

  /** reference state: the same WAL applied through the native merge path */
  private def referenceState(): Seq[Seq[Any]] = {
    val t = new LakeTable(spark, tmpDir("wref"), 4, ApplyMode.CopyOnWrite)
    t.merge(ChangeLogGen.changeLog(spark, cfg), "ref", 0L)
    stateOf(t)
  }

  test("append via DSv2 == merge; create-on-first-write; invariants recomputed") {
    val dir = tmpDir("wcreate")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal.where(col("lsn") <= 1500))
      .write.format("graft").option("create", "true").option("buckets", "4")
      .mode("append").save(dir)
    tableShape(wal.where(col("lsn") > 1500))
      .write.format("graft").mode("append").save(dir)
    val t = new LakeTable(spark, dir)
    assert(t.currentSnapshot().get.version == 2)
    assert(stateOf(t) == referenceState(),
      "DSv2 two-batch append must equal the native one-batch merge")
    // derived invariants recomputed, not trusted from the writer
    assert(t.read().where(col("lang") === "WRONG").isEmpty)
    assert(t.read().where(col("contentSha") === "untrusted").isEmpty)
  }

  test("one-shot dsv2 commit entries are pruned; ledger entries stay visible") {
    val dir = tmpDir("wprune")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    (0 until 3).foreach { i =>
      tableShape(wal.where(pmod(col("lsn"), lit(3)) === i))
        .write.format("graft").option("create", "true").option("buckets", "4")
        .mode("append").save(dir)
    }
    val t = new LakeTable(spark, dir)
    val snap = t.currentSnapshot().get
    assert(snap.committed.keys.count(_.startsWith("dsv2-")) == 1,
      s"earlier one-shot entries must be pruned, got ${snap.committed.keys}")
    // cpId carries a UUID — ledger entry files must still land FLAT
    assert(t.ledger.entries().size == 3, "every DSv2 commit must be visible in the ledger")
  }

  test("batch changeFeed read exposes real tombstones") {
    val dir = tmpDir("wcf")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal).write.format("graft").option("create", "true").option("buckets", "4")
      .mode("append").save(dir)
    val cf = spark.read.format("graft").option("changeFeed", "true").load(dir)
    assert(cf.columns.contains("deleted"))
    assert(cf.where(col("deleted")).count() > 0, "tombstone winners must surface")
    assert(collectSorted(cf.where(!col("deleted")).drop("deleted")
        .select("repo", "path", "commit", "lang", "contentSha", "lsn")) ==
      stateOf(new LakeTable(spark, dir)).map(identity), // live part unchanged
      "live rows must match the plain read")
  }

  test("a real event at the delete's lsn beats the tombstone (delete is 'as of now')") {
    val dir = tmpDir("wdeltie")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal).write.format("graft").option("create", "true").option("buckets", "4")
      .mode("append").save(dir)
    val t = new LakeTable(spark, dir)
    val victim = t.read().orderBy("repo", "path").select("repo", "path").head()
    t.deleteWhere(col("repo") === victim.getString(0) && col("path") === victim.getString(1))
    assert(t.read().where(col("repo") === victim.getString(0) &&
      col("path") === victim.getString(1)).isEmpty)
    val tieLsn = t.currentSnapshot().get.hwm // the tombstone's lsn
    // upstream delivers a GENUINE event at the same dense lsn: it must win
    import spark.implicits._
    val revive = Seq((tieLsn, "U", victim.getString(0), victim.getString(1),
        "aaaa0000aaaa0000aaaa0000aaaa0000aaaa0000", "revived-content"))
      .toDF("lsn", "op", "repo", "path", "commit", "content")
    t.merge(revive, "revive", 0L)
    val row = t.read().where(col("repo") === victim.getString(0) &&
      col("path") === victim.getString(1))
    assert(row.count() == 1, "the real event must beat the '!'-prefixed tombstone on an lsn tie")
  }

  test("updateWhere re-emits new versions; untouched and evolved columns survive") {
    val dir = tmpDir("wupd")
    val t = new LakeTable(spark, dir, 4, ApplyMode.CopyOnWrite)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    t.merge(wal.withColumn("branch", lit("main")), "u", 0L) // evolved extra column
    val before = t.read().count()
    val victimLang = t.read().groupBy("lang").count().orderBy(desc("count")).head().getString(0)
    val nVictims = t.read().where(col("lang") === victimLang).count()
    t.updateWhere(col("lang") === victimLang,
      Map("content" -> upper(col("content"))))
    assert(t.read().count() == before, "update must not add or drop keys")
    val updated = t.read().where(col("lang") === victimLang)
    assert(updated.count() == nVictims)
    // content transformed, sha recomputed, extras carried through
    assert(updated.where(col("contentSha") =!= sha2(col("content"), 256)).isEmpty)
    assert(updated.where(col("content") =!= upper(col("content"))).isEmpty,
      "content must be the transformed value")
    assert(updated.where(col("branch") =!= "main").isEmpty,
      "evolved columns must survive an update untouched")
    // key/bookkeeping columns are immutable
    intercept[IllegalArgumentException] {
      t.updateWhere(lit(true), Map("repo" -> lit("x")))
    }
  }

  test("dv-mode updateWhere writes O(victims): new versions + DVs, no rewrite") {
    val dir = tmpDir("wupddv")
    val t = new LakeTable(spark, dir, 4, ApplyMode.DeletionVector)
    t.merge(ChangeLogGen.changeLog(spark, cfg), "ud", 0L)
    val snap0 = t.currentSnapshot().get
    val victimLang = t.read().groupBy("lang").count().orderBy(desc("count")).head().getString(0)
    val nVictims = t.read().where(col("lang") === victimLang).count()
    t.updateWhere(col("lang") === victimLang, Map("content" -> upper(col("content"))))
    val snap1 = t.currentSnapshot().get
    assert(snap0.files.map(_.path).toSet.subsetOf(snap1.files.map(_.path).toSet),
      "dv update must keep every existing data file")
    val newRows = snap1.files.map(_.rows).sum - snap0.files.map(_.rows).sum
    assert(newRows == nVictims, s"dv update must write exactly the victims, wrote $newRows")
    assert(snap1.dvRows - snap0.dvRows == nVictims, "each victim's old position goes dead")
    assert(t.read().where(col("lang") === victimLang)
      .where(col("content") =!= upper(col("content"))).isEmpty)
  }

  test("null content tombstones a live key (Kafka-compaction convention)") {
    val dir = tmpDir("wtomb")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal).write.format("graft").option("create", "true").option("buckets", "4")
      .mode("append").save(dir)
    val t = new LakeTable(spark, dir)
    val victim = t.read().select("repo", "path").orderBy("repo", "path").head()
    val before = t.read().count()
    import spark.implicits._
    Seq((victim.getString(0), victim.getString(1), "tomb-commit",
        null: String, null: String, null: String, cfg.events + 1))
      .toDF("repo", "path", "commit", "lang", "content", "contentSha", "lsn")
      .write.format("graft").mode("append").save(dir)
    assert(t.read().count() == before - 1)
    assert(t.read().where(col("repo") === victim.getString(0) &&
      col("path") === victim.getString(1)).isEmpty)
  }

  test("overwrite truncates then applies; old snapshots still travel") {
    val dir = tmpDir("wover")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal).write.format("graft").option("create", "true").option("buckets", "4")
      .mode("append").save(dir)
    val t = new LakeTable(spark, dir)
    val v1rows = t.read().count()
    val keep = tableShape(wal.where(col("lsn") <= 100))
    keep.write.format("graft").mode("overwrite").save(dir)
    val after = t.read()
    assert(after.count() < v1rows)
    // only lsn <= 100 winners survive
    assert(after.where(col("lsn") > 100).isEmpty)
    // pre-overwrite snapshot still readable (truncate moved no data)
    assert(t.readAt(1).count() == v1rows)
  }

  /** register a GraftCatalog over a fresh warehouse dir, return (catalog, dir) */
  private def catalog(tag: String): (String, String) = {
    val warehouse = tmpDir(tag)
    val cat = s"gcat$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    (cat, warehouse)
  }

  test("SQL catalog: CREATE TABLE, INSERT INTO, DELETE FROM, SHOW, VERSION AS OF") {
    val (cat, warehouse) = catalog("wsql")
    spark.sql(s"""CREATE TABLE $cat.events (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'cow', 'buckets' = '4')""")
    assert(spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1)).contains("events"))

    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal.where(col("lsn") <= 2000)).createOrReplaceTempView("head_events")
    tableShape(wal.where(col("lsn") > 2000)).createOrReplaceTempView("tail_events")
    spark.sql(s"INSERT INTO $cat.events SELECT * FROM head_events")
    spark.sql(s"INSERT INTO $cat.events SELECT * FROM tail_events")
    val t = new LakeTable(spark, s"$warehouse/events")
    assert(stateOf(t) == referenceState(), "SQL INSERT tail must equal the native merge")

    val victimLang = t.read().groupBy("lang").count().orderBy(desc("count"))
      .head().getString(0)
    val java = t.read().where(col("lang") === victimLang).count()
    assert(java > 0)
    spark.sql(s"DELETE FROM $cat.events WHERE lang = '$victimLang'")
    assert(t.read().where(col("lang") === victimLang).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $cat.events").head().getLong(0)
      == referenceState().size - java)
    // time travel: before the delete, the Java rows were live
    assert(spark.sql(s"SELECT count(*) FROM $cat.events VERSION AS OF 3").head().getLong(0)
      == referenceState().size)
    // rename is a metadata move; the table stays readable
    spark.sql(s"ALTER TABLE $cat.events RENAME TO events2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.events2").head().getLong(0)
      == referenceState().size - java)
    spark.sql(s"DROP TABLE $cat.events2")
    assert(spark.sql(s"SHOW TABLES IN $cat").isEmpty)
  }

  test("TIMESTAMP AS OF resolves to the last commit at or before the instant") {
    val (cat, warehouse) = catalog("wts")
    spark.sql(s"""CREATE TABLE $cat.tt (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'cow', 'buckets' = '4')""")
    spark.sql(s"INSERT INTO $cat.tt VALUES ('r1','a.py','c1',null,'alpha',null,1)")
    Thread.sleep(30) // commit clocks are millisecond-granular
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    spark.sql(s"INSERT INTO $cat.tt VALUES ('r1','b.py','c2',null,'beta',null,2)")
    val t = new LakeTable(spark, s"$warehouse/tt")
    assert(t.read().count() == 2)
    // SQL surface: the literal resolves to the 1-row snapshot
    val lit = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.ofEpochMilli(between))
    assert(spark.sql(s"SELECT count(*) FROM $cat.tt TIMESTAMP AS OF '$lit'").head().getLong(0) == 1)
    // path-based DSv2 option + API spell the same resolution
    assert(spark.read.format("graft").option("timestampAsOf", between.toString)
      .load(s"$warehouse/tt").count() == 1)
    assert(t.readAtTimestamp(between).count() == 1)
    assert(t.readAtTimestamp(System.currentTimeMillis()).count() == 2)
    // before the first commit: a clear too-early error naming the earliest
    val e = intercept[Exception] { t.readAtTimestamp(1000L) }
    assert(e.getMessage.contains("no snapshot at or before"), e.getMessage)
  }

  test("delete on a dv-mode table writes deletion vectors, no bucket rewrite") {
    val (cat, warehouse) = catalog("wdvdel")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    val dir = s"$warehouse/dvt"
    tableShape(wal).write.format("graft")
      .option("create", "true").option("mode", "dv").option("buckets", "4")
      .mode("append").save(dir)
    val t = new LakeTable(spark, dir)
    assert(LakeTable.modeOf(t.currentSnapshot().get.mode) == ApplyMode.DeletionVector)
    val beforeFiles = t.currentSnapshot().get.files.map(_.path).toSet
    val victimLang = t.read().groupBy("lang").count().orderBy(desc("count"))
      .head().getString(0)
    spark.sql(s"DELETE FROM $cat.dvt WHERE lang = '$victimLang'")
    val snap = t.currentSnapshot().get
    assert(snap.dvRows > 0, "dv-mode delete must mark positions, not rewrite")
    assert(beforeFiles.subsetOf(snap.files.map(_.path).toSet),
      "dv-mode delete must keep all existing data files")
    assert(t.read().where(col("lang") === victimLang).isEmpty)
    // DSv2 read serves the DVs too
    assert(spark.read.format("graft").load(dir).where(col("lang") === victimLang).isEmpty)
  }

  test("freshly CREATEd-but-unwritten tables are selectable; DESCRIBE shows state") {
    val (cat, warehouse) = catalog("wfresh")
    // registered via the programmatic catalog (properties file only, no snapshot)
    new graft.table.Catalog(spark, warehouse).table("fresh", 4, ApplyMode.MergeOnRead)
    assert(spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1)).contains("fresh"))
    assert(spark.sql(s"SELECT * FROM $cat.fresh").isEmpty, "unwritten table = empty, not an error")
    // a written table exposes its layout + snapshot state as properties
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal).write.format("graft").option("create", "true").option("buckets", "4")
      .mode("append").save(s"$warehouse/desc_t")
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $cat.desc_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val props = desc.getOrElse("Table Properties", "")
    assert(props.contains("mode=cow") && props.contains("buckets=4") && props.contains("version=1"),
      s"expected layout in properties, got: $props")
  }

  test("CTAS through the catalog applies the merge semantics") {
    val (cat, warehouse) = catalog("wctas")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal).createOrReplaceTempView("ctas_events")
    spark.sql(s"""CREATE TABLE $cat.snap TBLPROPERTIES ('mode' = 'mor', 'buckets' = '4')
      AS SELECT * FROM ctas_events""")
    assert(stateOf(new LakeTable(spark, s"$warehouse/snap")) == referenceState())
  }

  test("mor-mode DSv2 writes append deltas; compaction converges") {
    val dir = tmpDir("wmor")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    (0 until 3).foreach { i =>
      tableShape(wal.where(pmod(col("lsn"), lit(3)) === i))
        .write.format("graft").option("create", "true").option("mode", "mor")
        .option("buckets", "4").mode("append").save(dir)
    }
    val t = new LakeTable(spark, dir)
    val stacked = t.currentSnapshot().get.files.groupBy(_.bucket).values.map(_.size).max
    assert(stacked > 1, "mor writes must stack deltas")
    assert(stateOf(t) == referenceState())
    t.compact()
    assert(stateOf(t) == referenceState())
  }

  test("writer requires an existing table unless create=true") {
    val dir = tmpDir("wmissing")
    val df = tableShape(ChangeLogGen.changeLog(spark, cfg)).limit(1)
    val e = intercept[Exception] {
      df.write.format("graft").mode("append").save(dir)
    }
    assert(e.getMessage.contains("no table at"), e.getMessage)
  }

  test("stream sink rejects reserved one-shot cpid prefixes") {
    // "update-feed" would lose its exactly-once CommitState to
    // pruneEphemeralCommits at the next commit and re-apply after a restart
    val e = intercept[IllegalArgumentException] {
      new graft.sources.GraftStreamSink(spark, tmpDir("wressink"),
        Map("cpid" -> "update-feed", "create" -> "true"))
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
  }

  test("stream sink with NO derivable identity fails loudly, never shares a constant key") {
    val sink = new graft.sources.GraftStreamSink(spark, tmpDir("wnoid"),
      Map("create" -> "true"))
    val df = tableShape(ChangeLogGen.changeLog(spark, cfg)).limit(1)
    // no cpid option, no checkpointLocation, no streaming queryId
    // thread-local: two anonymous queries sharing a constant fallback key
    // would silently drop each other's batches — this must be an error
    val e = intercept[IllegalStateException] { sink.addBatch(0L, df) }
    assert(e.getMessage.contains("cpid"), e.getMessage)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only evolution, old snapshots intact") {
    val (cat, warehouse) = catalog("walter")
    spark.sql(s"""CREATE TABLE $cat.evt (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'cow', 'buckets' = '4')""")
    val wal = ChangeLogGen.changeLog(spark, cfg)
    tableShape(wal.where(col("lsn") <= 500)).createOrReplaceTempView("alter_head")
    spark.sql(s"INSERT INTO $cat.evt SELECT * FROM alter_head")
    val t = new LakeTable(spark, s"$warehouse/evt")
    val vBefore = t.currentSnapshot().get.version
    val filesBefore = t.currentSnapshot().get.files.map(_.path).toSet

    spark.sql(s"ALTER TABLE $cat.evt ADD COLUMN branch STRING")
    val snap = t.currentSnapshot().get
    assert(snap.version == vBefore + 1)
    assert(snap.files.map(_.path).toSet == filesBefore, "ADD COLUMN must move no data")
    // new column reads back null over pre-evolution files
    val viaSql = spark.sql(s"SELECT branch FROM $cat.evt")
    assert(viaSql.count() > 0 && viaSql.where(col("branch").isNotNull).isEmpty)
    // pre-evolution snapshot still readable as written
    assert(!spark.sql(s"SELECT * FROM $cat.evt VERSION AS OF $vBefore")
      .columns.contains("branch"))
    // writes can now fill the column
    tableShape(wal.where(col("lsn") === 600)).withColumn("branch", lit("main"))
      .createOrReplaceTempView("alter_tail")
    spark.sql(s"INSERT INTO $cat.evt SELECT * FROM alter_tail")
    assert(spark.sql(s"SELECT branch FROM $cat.evt WHERE branch = 'main'").count() > 0)
    // duplicates and retype stay rejected; DROP/RENAME are column-mapping
    // metadata ops since round 5 (SchemaEvolutionSpec pins them)
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evt ADD COLUMN branch STRING")
    }.getMessage.contains("already exist"))
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evt ALTER COLUMN branch TYPE BIGINT")
    }.getMessage.toLowerCase.contains("not_supported_change_column"))
    // NOT NULL cannot be honored (existing rows null-backfill) — reject,
    // never silently coerce to nullable
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.evt ADD COLUMN strict STRING NOT NULL")
    }.getMessage.contains("NOT NULL"))
  }

  test("catalog rejects identifier segments that escape the warehouse root") {
    val (cat, warehouse) = catalog("wtrav")
    val fs = new graft.table.Fs(spark.sessionState.newHadoopConf())
    fs.atomicWrite(s"$warehouse/../victim-marker.txt", "outside the warehouse")
    for (bad <- Seq("a/b", "..", "a\\b")) {
      val e = intercept[Exception] {
        spark.sql(s"DROP TABLE $cat.`$bad`")
      }
      assert(e.getMessage.contains("illegal identifier segment")
        || e.getMessage.toLowerCase.contains("table or view not found")
        || e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"), s"$bad -> ${e.getMessage}")
    }
    assert(fs.exists(s"$warehouse/../victim-marker.txt"), "nothing outside the root may be touched")
  }
}
