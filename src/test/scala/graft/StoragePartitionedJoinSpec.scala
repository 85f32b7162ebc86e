package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.sources.GraftBucketFunction
import graft.table.{ApplyMode, LakeTable}

/** Storage-partitioned joins (round-7). Spark 4.1's SPJ machinery only
  * accepts partition transforms over a SINGLE column reference
  * (`KeyGroupedPartitioning.supportsExpressions`), so the two-column
  * layout hash `bucket(n, repo, path)` can't key the physical
  * partitioning directly. Instead the bucket id is exposed as the
  * `_bucket` METADATA column (stamped per task — every live-scan task
  * holds exactly one bucket), `GraftScan` reports
  * `KeyGroupedPartitioning(identity(_bucket))` when it's read, and an
  * equi-join whose ON clause includes `a._bucket = b._bucket` (a
  * semantic no-op between same-bucket-count tables — `_bucket` is a
  * function of the join key) plans ZERO Exchanges under
  * `spark.sql.sources.v2.bucketing.enabled`: each task zips one bucket's
  * files from both sides. The specs pin (a) the zero-shuffle plan, (b)
  * result identity vs the shuffled join, (c) `_bucket` bit-identity with
  * the write path's hash in both the row and vectorized readers, (d)
  * safe fallback when the conjunct is absent, and (e) that the catalog
  * `bucket` function matches the layout hash.
  */
class StoragePartitionedJoinSpec extends SparkSpec {

  private val cfg = GenConfig(seed = 77, events = 4000, repos = 10, filesPerRepo = 12)

  private def build(tag: String, buckets: Int, mode: ApplyMode.Value,
                    lsnTo: Long): LakeTable = {
    val t = new LakeTable(spark, s"${wh}/$tag", buckets, mode)
    t.merge(ChangeLogGen.changeLog(spark, cfg).where(col("lsn") <= lsnTo), tag, 0L)
    t
  }

  private lazy val wh = tmpDir("spjwh")

  private def registerCat(): Unit = {
    spark.conf.set("spark.sql.catalog.spj", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.root", wh)
  }

  private def withSpj[T](f: => T): T = {
    // broadcast joins off so an Exchange-free plan can only come from SPJ
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    // join keys (repo, path, _bucket) are a SUPERSET of the partition key
    // (_bucket) — EnsureRequirements only builds a KeyGroupedShuffleSpec
    // for that shape with the exact-match requirement relaxed
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try f
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private val spjJoinSql =
    """SELECT a.repo, a.path, b.contentSha AS sha_b, a.lang
      |FROM spj.spj_a a JOIN spj.spj_b b
      |ON a.repo = b.repo AND a.path = b.path AND a._bucket = b._bucket""".stripMargin

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize the adaptive plan before reading it
    df.queryExecution.executedPlan.toString
  }

  private def exchanges(plan: String): Int =
    "Exchange".r.findAllMatchIn(plan).size

  private def keyed(df: DataFrame): Map[(String, String), String] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap

  test("co-bucketed equi-join with the _bucket conjunct plans ZERO Exchanges (SPJ)") {
    // TWO MoR commits: buckets hold 2 delta files each, so spj_a reads
    // through the row-based latest-per-key RESOLVE readers — pinning that
    // SPJ partitions and `_bucket` stamping survive the MoR merge path,
    // not just the vectorized single-file path (spj_b, CoW)
    val t1 = new LakeTable(spark, s"${wh}/spj_a", 8, ApplyMode.MergeOnRead)
    t1.merge(ChangeLogGen.changeLog(spark, cfg).where(col("lsn") <= 2000), "spj_a", 0L)
    t1.merge(ChangeLogGen.changeLog(spark, cfg)
      .where(col("lsn") > 2000 && col("lsn") <= 4000), "spj_a", 1L)
    val t2 = build("spj_b", 8, ApplyMode.CopyOnWrite, 3000)
    registerCat()
    withSpj {
      val joined = spark.sql(spjJoinSql)
      val plan = finalPlan(joined)
      assert(exchanges(plan) == 0, s"SPJ must elide both Exchanges:\n$plan")
      // identity vs the shuffled path-based join (no catalog, no SPJ, no
      // _bucket conjunct — it's a semantic no-op between co-bucketed tables)
      val expect = t1.read().as("a").join(t2.read().as("b"),
          Seq("repo", "path"))
        .select(col("repo"), col("path"), col("b.contentSha"), col("a.lang"))
      assert(joined.count() == expect.count())
      assert(keyed(joined.select("repo", "path", "sha_b")) ==
        keyed(expect.select("repo", "path", "contentSha")))
    }
  }

  test("_bucket metadata column is the layout hash, row AND vectorized readers") {
    registerCat()
    // spj_a is un-compacted MoR (row-based resolve readers); spj_b is CoW
    // (vectorized ColumnarBatch readers with the constant-vector splice)
    for (tbl <- Seq("spj_a", "spj_b")) {
      val rows = spark.sql(
        s"""SELECT repo, path, _bucket,
           |       cast(pmod(xxhash64(repo, path), 8) AS int) AS expect
           |FROM spj.$tbl""".stripMargin).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getInt(2) == r.getInt(3),
          s"$tbl ${r.getString(0)}/${r.getString(1)}: _bucket=${r.getInt(2)} hash=${r.getInt(3)}")
      }
    }
  }

  test("without the _bucket conjunct the join shuffles, results intact") {
    registerCat()
    withSpj {
      val joined = spark.sql(
        """SELECT a.repo, a.path, b.contentSha AS sha_b
          |FROM spj.spj_a a JOIN spj.spj_b b
          |ON a.repo = b.repo AND a.path = b.path""".stripMargin)
      val plan = finalPlan(joined)
      // _bucket unread -> the scans report unknown partitioning -> shuffled
      assert(exchanges(plan) >= 1, plan)
      assert(keyed(joined) ==
        keyed(spark.sql(spjJoinSql).select("repo", "path", "sha_b")))
    }
  }

  test("mismatched bucket counts: plain full-key join stays correct (no conjunct)") {
    build("spj_c", 16, ApplyMode.MergeOnRead, 4000)
    registerCat()
    withSpj {
      // NOTE the contract: `a._bucket = b._bucket` is only a semantic no-op
      // between tables with the SAME bucket count — across 8 vs 16 buckets
      // it would genuinely filter rows. The supported join here is the
      // plain full-key join (shuffled; 8 vs 16 cannot co-partition).
      val joined = spark.sql(
        """SELECT a.repo, a.path, b.contentSha AS sha_b
          |FROM spj.spj_a a JOIN spj.spj_c b
          |ON a.repo = b.repo AND a.path = b.path""".stripMargin)
      val plan = finalPlan(joined)
      assert(exchanges(plan) >= 1, s"8 vs 16 buckets cannot co-partition:\n$plan")
      assert(joined.count() > 0)
    }
  }

  test("GROUP BY including _bucket aggregates with ZERO Exchanges (bucket-local agg)") {
    registerCat()
    withSpj {
      val agg = spark.sql(
        """SELECT repo, _bucket, count(*) AS n
          |FROM spj.spj_b GROUP BY repo, _bucket""".stripMargin)
      val plan = finalPlan(agg)
      assert(exchanges(plan) == 0,
        s"KeyGroupedPartitioning(_bucket) must satisfy the grouping:\n$plan")
      // identity vs the shuffled per-repo counts (summed across buckets)
      val viaBuckets = agg.collect()
        .groupBy(_.getString(0)).map { case (r, rows) => r -> rows.map(_.getLong(2)).sum }
      val plain = spark.sql("SELECT repo, count(*) FROM spj.spj_b GROUP BY repo")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == plain)
    }
  }

  test("partial-key join (repo only) does not claim co-partitioning") {
    registerCat()
    withSpj {
      val joined = spark.sql(
        """SELECT a.repo, count(*) AS n
          |FROM spj.spj_a a JOIN spj.spj_b b ON a.repo = b.repo
          |GROUP BY a.repo""".stripMargin)
      val plan = finalPlan(joined)
      assert(exchanges(plan) >= 1, plan)
      assert(joined.collect().nonEmpty)
    }
  }

  test("conf off: same query, plans shuffles, same results (default untouched)") {
    registerCat()
    val off = spark.sql(spjJoinSql)
    val offPlan = finalPlan(off)
    assert(exchanges(offPlan) >= 1,
      s"v2 bucketing must stay opt-in (default off):\n$offPlan")
    val offRows = keyed(off.select("repo", "path", "sha_b"))
    withSpj {
      assert(keyed(spark.sql(spjJoinSql).select("repo", "path", "sha_b")) == offRows)
    }
  }

  test("catalog bucket function is bit-identical to the write path's hash") {
    val sample = ChangeLogGen.changeLog(spark, cfg)
      .select("repo", "path").distinct().limit(200)
    for (n <- Seq(8, 16, 512)) {
      val viaCol = sample
        .withColumn("b", pmod(xxhash64(col("repo"), col("path")), lit(n.toLong)).cast("int"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      viaCol.foreach { case (repo, path, b) =>
        val got = GraftBucketFunction.Bound.produceResult(
          org.apache.spark.sql.catalyst.InternalRow(n,
            org.apache.spark.unsafe.types.UTF8String.fromString(repo),
            org.apache.spark.unsafe.types.UTF8String.fromString(path)))
        assert(got == b, s"bucket($n, $repo, $path): function=$got layout=$b")
      }
    }
    // and the unbound signature is enforced
    intercept[IllegalArgumentException] {
      GraftBucketFunction.bind(org.apache.spark.sql.types.StructType.fromDDL("a INT, b INT, c STRING"))
    }
  }
}
