package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row numbering WITHOUT the single-task global window
  * (`Window.orderBy` with no partitioning funnels every row through one
  * task — the round-1 scale-killer in q7/q8/q13).
  *
  * Standard distributed-rank shape: range-partition on the order key (so
  * partition i holds strictly smaller keys than partition i+1), rank WITHIN
  * each partition (parallel window), then add per-partition offsets — a
  * P-row driver-side cumulative sum broadcast back. Two scans of the input
  * (the local-rank pass and the per-partition count), each fully parallel.
  */
object DistributedRank {

  /** append `out` = global 1-based row number under `order` (which must be
    * a total order — include a unique tiebreaker column).
    */
  def withRowNumber(df: DataFrame, order: Seq[Column], out: String,
                    parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    // localCheckpoint (eager): the offsets pass (collect below) and the
    // caller's rank pass both consume the SAME materialised partitioning.
    // persist() would be unsafe here — if cached blocks were evicted and
    // recomputed, repartitionByRange could RESAMPLE its boundaries between
    // the counts pass and the rank pass, making the broadcast offsets
    // inconsistent with the local ranks. Checkpoint blocks are freed with
    // the RDD (no cache-manager squatting).
    val ranged = df.repartitionByRange(p, order: _*).withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = ranged.withColumn("__lrn",
      row_number().over(Window.partitionBy("__pid").orderBy(order: _*)))
    // per-partition counts -> cumulative offsets (P rows on the driver)
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    local.join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, (col("__lrn") + col("__off")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }

  /** exact ntile(tiles) from a global row number — identical tile split as
    * SQL NTILE: with m rows, the first m % tiles tiles get ⌈m/tiles⌉ rows.
    */
  def ntileFromRank(rank: Column, m: Long, tiles: Int): Column = {
    val base = m / tiles; val rem = m % tiles
    val cut = rem * (base + 1)
    when(rank <= cut, ((rank - 1) / (base + 1)) + 1)
      .otherwise(lit(rem) + ((rank - 1 - cut) / base) + 1)
      .cast("int")
  }
}
