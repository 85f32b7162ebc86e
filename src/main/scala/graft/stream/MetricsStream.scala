package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas

/** Streaming throughput metrics over the WAL (SURVEY.md §2.10): a genuine
  * stateful Structured Streaming aggregation — tumbling event-time windows
  * with a watermark bounding state. The zonal-grid analogue of the
  * reference's fishnet/H3 bucketing (stuttgart_maps_all.py:331-336), with
  * the time axis instead of space.
  */
object MetricsStream {

  /** events per (window, op) with per-window LSN ranges; append-mode output
    * — rows finalise when the watermark passes the window end. `slide`
    * (SURVEY.md W6) < window duration makes the windows OVERLAPPING —
    * each event lands in duration/slide windows; state stays bounded by the
    * same watermark.
    */
  def windowedOpCounts(spark: SparkSession, walDir: String, window_ : String = "1 hour",
                       watermark: String = "30 minutes", slide: Option[String] = None): DataFrame =
    spark.readStream
      .schema(Schemas.changeEvent)
      .parquet(walDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide.getOrElse(window_)).as("w"), col("op"))
      .agg(count(lit(1)).as("n"), min("lsn").as("min_lsn"), max("lsn").as("max_lsn"))
      .select(col("w.start").as("window_start"), col("op"), col("n"), col("min_lsn"), col("max_lsn"))

  /** run to completion into an in-memory sink; returns the query name. */
  def runToMemory(spark: SparkSession, walDir: String, name: String,
                  checkpointDir: String): StreamingQuery =
    windowedOpCounts(spark, walDir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
