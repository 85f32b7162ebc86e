package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.table.{ApplyMode, LakeTable}

/** CHECK constraints (Delta's table-constraint semantics): add validates
  * existing live rows, every write path enforces in-pipeline (a violating
  * batch fails before any metadata lands, table state byte-unchanged),
  * tombstones are exempt, nulls violate, schema evolution cannot orphan a
  * constraint, and the SQL procedure surface round-trips it all.
  */
class ConstraintSpec extends SparkSpec {

  import spark.implicits._

  /** synthetic events: NO lang/contentSha (clean derives them), op required */
  private def ev(rows: (Long, String, String, String, String, String)*): DataFrame =
    rows.toDF("lsn", "op", "repo", "path", "commit", "content")
      .withColumn("ts", to_timestamp(lit("2026-01-01 00:00:00")))

  private def stateOf(t: LakeTable) =
    collectSorted(t.read().select("repo", "path", "commit", "contentSha"))

  for (mode <- Seq(ApplyMode.CopyOnWrite, ApplyMode.MergeOnRead, ApplyMode.DeletionVector)) {
    test(s"violating batch fails the commit, state unchanged ($mode)") {
      val t = new LakeTable(spark, tmpDir(s"cstr-$mode"), defaultBuckets = 4, mode)
      t.merge(ev((1L, "A", "r1", "a.py", "c1", "alpha"), (2L, "A", "r2", "b.rs", "c2", "beta")), "c", 0L)
      t.addConstraint("content_min_len", "length(content) >= 4")
      val before = stateOf(t)
      val vBefore = t.currentSnapshot().get.version

      val bad = intercept[Exception] {
        t.merge(ev((3L, "U", "r1", "a.py", "c3", "ok"), (4L, "A", "r3", "c.go", "c4", "gamma")), "c", 1L)
      }
      assert(exMessage(bad).contains("content_min_len"),
        s"error must name the constraint: ${exMessage(bad)}")
      assert(t.currentSnapshot().get.version == vBefore, "no commit may land")
      assert(stateOf(t) == before, "table state byte-unchanged after the failed batch")

      // the same batchId retries clean after the producer fixes the data
      t.merge(ev((3L, "U", "r1", "a.py", "c3", "okay!"), (4L, "A", "r3", "c.go", "c4", "gamma")), "c", 1L)
      assert(t.read().count() == 3)
      // the data commit carries the constraint forward (merge rebuilds the
      // snapshot explicitly — dropping metadata there silently disarms
      // every later enforcement, the exact bug this line pins)
      assert(t.currentSnapshot().get.constraints.contains("content_min_len"))
    }
  }

  test("tombstones are exempt; nulls violate") {
    val t = new LakeTable(spark, tmpDir("cstr-del"), defaultBuckets = 4, ApplyMode.MergeOnRead)
    t.merge(ev((1L, "A", "r1", "a.py", "c1", "alpha")), "d", 0L)
    t.addConstraint("nonempty", "length(content) > 0")
    // a delete event carries null content by contract — exempt
    t.merge(ev((2L, "D", "r1", "a.py", "c2", null)), "d", 1L)
    assert(t.read().count() == 0)
    // a LIVE row whose expression evaluates null is a violation (Delta rule)
    val bad = intercept[Exception] {
      t.merge(ev((3L, "A", "r2", "b.rs", "c3", null)), "d", 2L)
    }
    assert(exMessage(bad).contains("nonempty"))
  }

  test("addConstraint validates existing live rows and rejects bad expressions") {
    val t = new LakeTable(spark, tmpDir("cstr-add"), defaultBuckets = 4, ApplyMode.CopyOnWrite)
    t.merge(ev((1L, "A", "r1", "a.py", "c1", "xy")), "a", 0L)
    val bad = intercept[Exception] { t.addConstraint("min_len", "length(content) >= 4") }
    assert(exMessage(bad).contains("min_len") && exMessage(bad).contains("r1"),
      s"validation names the constraint and a sample key: ${exMessage(bad)}")
    // a deleted key's old value cannot block the constraint (live rows only)
    t.merge(ev((2L, "D", "r1", "a.py", "c2", null), (3L, "A", "r2", "b.rs", "c3", "gamma")), "a", 1L)
    t.addConstraint("min_len", "length(content) >= 4")
    // unresolvable / non-boolean / aggregate expressions are rejected up front
    intercept[Exception] { t.addConstraint("bogus", "no_such_col > 1") }
    intercept[Exception] { t.addConstraint("agg", "count(1) > 0") }
    intercept[Exception] { t.addConstraint("del", "deleted = false") }
    intercept[Exception] { t.addConstraint("min_len", "length(content) >= 1") } // duplicate name
    // non-deterministic expressions: add-time validation and the write-time
    // guard would disagree row-by-row (Delta rejects these too)
    val nd = intercept[Exception] { t.addConstraint("lucky", "rand() < 0.5") }
    assert(exMessage(nd).contains("non-deterministic"), exMessage(nd))
    assert(t.currentSnapshot().get.constraints.keySet == Set("min_len"))
  }

  test("constraints survive the snapshot round-trip and DML routes enforce them") {
    val root = tmpDir("cstr-dml")
    val t = new LakeTable(spark, root, defaultBuckets = 4, ApplyMode.MergeOnRead)
    t.merge(ev((1L, "A", "r1", "a.py", "c1", "alpha"), (2L, "A", "r2", "b.rs", "c2", "beta")), "m", 0L)
    t.addConstraint("min_len", "length(content) >= 4")
    // a FRESH handle reads the constraint back from the snapshot JSON
    val t2 = new LakeTable(spark, root)
    assert(t2.currentSnapshot().get.constraints == Map("min_len" -> "length(content) >= 4"))
    // updateWhere derives events through the same merge path — enforced
    val bad = intercept[Exception] {
      t2.updateWhere(col("repo") === "r1", Map("content" -> lit("no")))
    }
    assert(exMessage(bad).contains("min_len"))
    t2.updateWhere(col("repo") === "r1", Map("content" -> lit("alpha2")))
    assert(collectSorted(t2.read().select("repo", "content")) ==
      Seq(Seq("r1", "alpha2"), Seq("r2", "beta")))
    // deleteWhere (tombstones) passes untouched
    t2.deleteWhere(col("repo") === "r2")
    assert(t2.read().count() == 1)
  }

  test("schema evolution cannot orphan a constraint; drop re-opens it") {
    val t = new LakeTable(spark, tmpDir("cstr-evo"), defaultBuckets = 4, ApplyMode.CopyOnWrite)
    t.merge(ev((1L, "A", "r1", "a.py", "c1", "alpha"))
      .withColumn("score", lit(5)), "e", 0L)
    t.addConstraint("pos_score", "score > 0")
    val r = intercept[Exception] { t.renameColumn("score", "points") }
    assert(exMessage(r).contains("pos_score"))
    val d = intercept[Exception] { t.dropColumn("score") }
    assert(exMessage(d).contains("pos_score"))
    // a batch MISSING the constrained column null-backfills → violation,
    // surfaced as the constraint (not an unresolved-column analysis error)
    val bad = intercept[Exception] { t.merge(ev((2L, "A", "r2", "b.rs", "c2", "beta")), "e", 1L) }
    assert(exMessage(bad).contains("pos_score"))
    t.dropConstraint("pos_score")
    t.renameColumn("score", "points")
    t.merge(ev((2L, "A", "r2", "b.rs", "c2", "beta")), "e", 1L)
    assert(t.read().where(col("points").isNull).count() == 1)
    // constraints resolve against the RENAMED (logical) name
    t.addConstraint("pos_points", "coalesce(points, 1) > 0")
    t.merge(ev((3L, "A", "r3", "c.go", "c3", "gamma")).withColumn("points", lit(7)), "e", 2L)
    assert(intercept[Exception] {
      t.merge(ev((4L, "A", "r4", "d.js", "c4", "delta")).withColumn("points", lit(-1)), "e", 3L)
    }.toString.nonEmpty)
  }

  test("SQL surface: CALL add_constraint / drop_constraint, DESCRIBE DETAIL, INSERT enforcement") {
    val warehouse = tmpDir("cstr-sql")
    val cat = "gcstr"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", warehouse)
    spark.sql(s"""CREATE TABLE $cat.t (repo STRING, path STRING, commit STRING,
      lang STRING, content STRING, contentSha STRING, lsn BIGINT)
      TBLPROPERTIES ('mode' = 'mor', 'buckets' = '4')""")
    spark.sql(s"INSERT INTO $cat.t VALUES ('r1','a.py','c1',null,'alpha',null,1)")
    val added = spark.sql(
      s"CALL $cat.system.add_constraint('t', 'min_len', 'length(content) >= 4')").collect().head
    assert(added.getString(0) == "min_len" && added.getInt(2) == 1)
    val detail = spark.sql(s"CALL $cat.system.describe_detail('t')").collect().head
    assert(detail.getAs[String]("constraints") == "min_len CHECK (length(content) >= 4)")
    val bad = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES ('r2','b.rs','c2',null,'no',null,2)")
    }
    assert(exMessage(bad).contains("min_len"))
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 1)
    spark.sql(s"CALL $cat.system.drop_constraint('t', 'min_len')")
    spark.sql(s"INSERT INTO $cat.t VALUES ('r2','b.rs','c2',null,'no',null,2)")
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 2)
  }

  /** full chain message (Spark wraps task failures; the raise_error text
    * rides in a cause)
    */
  private def exMessage(e: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = e
    while (cur != null) { sb.append(cur.getMessage).append('\n'); cur = cur.getCause }
    sb.toString
  }
}
