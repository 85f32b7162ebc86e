package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{DistributedRank, Quantiles}

/** The scalable replacements for global-window ops must be EXACTLY
  * equivalent to the single-task forms they replace (rank, ntile,
  * percent_rank threshold) — equivalence pinned against the real testdata.
  */
class ScalableRankSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  def events = spark.read.parquet(s"$dir/events.parquet")

  test("kthSmallest == sorted order statistic for k across the range") {
    val vals = events.select(col("value").cast("double")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    for (k <- Seq(1L, 2L, n / 4L, n / 2L, (0.8 * (n - 1)).ceil.toLong, n - 1L, n.toLong)) {
      val got = Quantiles.kthSmallest(events, col("value"), k)
      assert(got == vals((k - 1).toInt), s"k=$k")
    }
  }

  test("kthSmallest survives heavy ties and tiny collectCap") {
    import spark.implicits._
    val df = (Seq.fill(500)(7.0) ++ Seq.fill(300)(1.0) ++ Seq.fill(200)(9.5)).toDF("v")
    assert(Quantiles.kthSmallest(df, col("v"), 1, buckets = 4, collectCap = 8) == 1.0)
    assert(Quantiles.kthSmallest(df, col("v"), 300, buckets = 4, collectCap = 8) == 1.0)
    assert(Quantiles.kthSmallest(df, col("v"), 301, buckets = 4, collectCap = 8) == 7.0)
    assert(Quantiles.kthSmallest(df, col("v"), 800, buckets = 4, collectCap = 8) == 7.0)
    assert(Quantiles.kthSmallest(df, col("v"), 801, buckets = 4, collectCap = 8) == 9.5)
    assert(Quantiles.kthSmallest(df, col("v"), 1000, buckets = 4, collectCap = 8) == 9.5)
  }

  test("withRowNumber == global row_number (and plan has no unpartitioned window)") {
    val per = events.groupBy("user_id").agg(sum("value").as("s"))
    val order = Seq(col("s"), col("user_id"))
    val got = DistributedRank.withRowNumber(per, order, "r", parts = 4)
    val want = per.withColumn("r", row_number().over(Window.orderBy(order: _*)).cast("long"))
    assert(collectSorted(got.select("user_id", "r")) == collectSorted(want.select("user_id", "r")))
    val plan = got.queryExecution.executedPlan.toString
    // every Window in the scalable plan is partitioned (by __pid)
    plan.linesIterator.filter(_.contains("Window")).foreach { l =>
      assert(l.contains("__pid"), s"unpartitioned window in plan: $l")
    }
  }

  test("ntileFromRank == SQL ntile for awkward m/tiles splits") {
    import spark.implicits._
    for (m <- Seq(7, 10, 11, 23)) {
      val df = (1 to m).toDF("k")
      val want = df.withColumn("t", ntile(5).over(Window.orderBy("k")))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val got = df.select(col("k"), DistributedRank.ntileFromRank(col("k").cast("long"), m, 5).as("t"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got == want, s"m=$m")
    }
  }

  test("approx_percentile agrees with the exact operator (the documented fallback)") {
    // the built-in sketch path (one aggregate, no driver loop) is the
    // alternative when 3-4 scans are too many; with accuracy >= n it is
    // exact, and its answer must be bracketed by exact order statistics
    import graft.operators.Quantiles
    val n = events.count()
    val approx = events.agg(
      percentile_approx(col("value"), lit(0.9), lit(1000000)).as("v")).collect().head.getDouble(0)
    val k = math.max(1L, math.ceil(0.9 * n).toLong)
    val lo = Quantiles.kthSmallest(events, col("value"), math.max(1L, k - 1))
    val hi = Quantiles.kthSmallest(events, col("value"), math.min(n, k + 1))
    assert(approx >= lo && approx <= hi, s"approx=$approx not in [$lo, $hi]")
  }

  test("q13 scalable form == literal percent_rank form") {
    val literal = events
      .withColumn("pr", percent_rank().over(Window.orderBy("value")))
      .where(col("pr") >= 0.8)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val scalable = graft.queries.RelationalQueries.q13PercentRankFilter(spark, dir)
    assert(collectSorted(scalable) == collectSorted(literal.orderBy("event_type")))
  }

  test("q7/q8 plans contain no unpartitioned window") {
    for (q <- Seq(graft.queries.RelationalQueries.q7Rank(spark, dir),
                  graft.queries.RelationalQueries.q8Ntile(spark, dir))) {
      q.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("Window")).foreach { l =>
          assert(l.contains("__pid"), s"unpartitioned window: $l")
        }
      assert(q.count() > 0)
    }
  }
}
