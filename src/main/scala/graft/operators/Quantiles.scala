package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort or a
  * single-task window (SURVEY.md §2.3 P8 / §2.5 A10 at scale).
  *
  * `kthSmallest` finds the exact k-th smallest value by iterative histogram
  * refinement: each round buckets the candidate value range into B equal
  * slices with one shuffle-free aggregate (map-side combine on B counters),
  * walks the B counts on the driver to find the bucket containing rank k,
  * and narrows to it. The candidate set shrinks ~B× per round, so a 10^10-row
  * column resolves in 3-4 column-pruned scans; the final ≤`collectCap`
  * survivors are sorted driver-side. No row ever moves — only B counters per
  * partition — which is the shape the reference's percentile-clip
  * normalisation (scripts/make_maps.py:208-215) needs at lake scale.
  */
object Quantiles {

  /** exact k-th smallest (1-indexed) of a non-null double column */
  def kthSmallest(df: DataFrame, valueCol: Column, k: Long,
                  buckets: Int = 2048, collectCap: Int = 65536): Double = {
    require(k >= 1, s"k must be >= 1, got $k")
    var cur = df.select(valueCol.cast("double").as("__v")).where(col("__v").isNotNull)
    var rank = k // rank of the target within `cur`
    var iter = 0
    while (iter < 64) {
      iter += 1
      val head = cur.agg(count(lit(1)), min("__v"), max("__v")).collect().head
      val n = head.getLong(0)
      require(rank <= n, s"rank $rank out of range (n=$n)")
      val lo = head.getDouble(1); val hi = head.getDouble(2)
      if (lo == hi) return lo
      if (n <= collectCap) {
        val sorted = cur.collect().map(_.getDouble(0)).sorted
        return sorted((rank - 1).toInt)
      }
      // bucket index: same expression for counting and for narrowing, so
      // float boundary rows land identically in both passes
      val width = (hi - lo) / buckets
      val b = least(floor((col("__v") - lo) / width), lit(buckets - 1L)).cast("int")
      val histo = cur.groupBy(b.as("__b")).agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var cum = 0L; var target = -1
      var i = 0
      while (i < buckets && target < 0) {
        val c = histo.getOrElse(i, 0L)
        if (cum + c >= rank) target = i else cum += c
        i += 1
      }
      rank -= cum
      cur = cur.where(b === target)
    }
    // numerically-degenerate range (won't refine): fall back to exact sort
    // of what's left — bounded because each round strictly shrank the set
    val sorted = cur.collect().map(_.getDouble(0)).sorted
    sorted((rank - 1).toInt)
  }

  /** exact quantile at fraction p, order statistic k = ceil(p * n)
    * (1-indexed, type-1 / discontinuous — pins one unambiguous semantic
    * both engines can express)
    */
  def exactQuantile(df: DataFrame, valueCol: Column, p: Double): Double = {
    val n = df.select(valueCol).where(valueCol.isNotNull).count()
    require(n > 0, "empty input")
    kthSmallest(df, valueCol, math.max(1L, math.ceil(p * n).toLong))
  }
}
