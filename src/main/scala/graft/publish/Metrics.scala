package graft.publish

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.Salting
import graft.table.LakeTable

/** Publish layer (SURVEY.md §3.3): query-optimised rollups over the clean
  * lake table — the engine's analogue of the reference's KPI stage
  * (make_maps.py compute_kpis, :106-217). All batch queries over a
  * snapshot; written by the caller as a new table/export.
  */
object Metrics {

  /** A1/A2: per-repo live-file counts and content volume — salted two-phase
    * aggregation because the fixture's hot repo carries half the rows.
    */
  def repoSummary(t: LakeTable, salts: Int = 16): DataFrame = {
    val live = t.read()
    Salting.saltedAgg(live,
      key = Seq(col("repo")), fine = col("path"), salts = salts,
      partial = Seq(count(lit(1)).as("__n"), sum(length(col("content"))).as("__bytes"),
        max("lsn").as("__hwm")),
      combine = Seq(sum("__n").as("n_files"), sum("__bytes").as("total_bytes"),
        max("__hwm").as("max_lsn")))
      .orderBy("repo")
  }

  /** A5 frequency table: lang distribution (the reference's per-run
    * category distribution log, process_layers.py:207-209).
    */
  def langDistribution(t: LakeTable): DataFrame =
    t.read().groupBy("lang").agg(count(lit(1)).as("n")).orderBy(desc("n"), col("lang"))

  /** A7 Shannon entropy of the lang mix per repo — the reference's
    * service-diversity entropy (stuttgart_maps_all.py:616-626).
    */
  def langEntropyPerRepo(t: LakeTable): DataFrame = {
    val counts = t.read().groupBy("repo", "lang").agg(count(lit(1)).cast("double").as("cnt"))
    counts
      .withColumn("p", col("cnt") / sum("cnt").over(Window.partitionBy("repo")))
      .groupBy("repo").agg(round(-sum(col("p") * log(col("p"))), 6).as("lang_entropy"))
      .orderBy("repo")
  }

  /** A4: distinct content per repo (dedup pressure metric). Exact here;
    * at 10^10 scale switch to approx_count_distinct (HLL) — same shape.
    */
  def contentDiversity(t: LakeTable, approx: Boolean = false): DataFrame = {
    val agg = if (approx) approx_count_distinct(col("contentSha")).as("n_distinct")
      else countDistinct(col("contentSha")).as("n_distinct")
    t.read().groupBy("repo").agg(count(lit(1)).as("n_files"), agg).orderBy("repo")
  }

  /** A10/W4: repo size percentiles + min-max normalised size score. */
  def repoSizeScores(t: LakeTable): DataFrame = {
    val sizes = t.read().groupBy("repo").agg(sum(length(col("content"))).as("bytes"))
    val bounds = sizes.agg(min("bytes").as("lo"), max("bytes").as("hi"))
    sizes.crossJoin(broadcast(bounds))
      .select(col("repo"), col("bytes"),
        round((col("bytes") - col("lo")) / greatest(col("hi") - col("lo"), lit(1)), 6).as("size_score"))
      .orderBy("repo")
  }

  /** ledger rollup: per-batch applied rows + LSN high-watermark over time —
    * the ops dashboard the reference keeps as run_info.json files.
    */
  def ledgerTimeline(spark: SparkSession, t: LakeTable): DataFrame =
    spark.read.json(s"${t.root}/ledger")
      .select(col("checkpointId"), col("batchId"), col("appliedLsnHwm"),
        col("liveRows"), col("tombstoneRows"))
      .orderBy("checkpointId", "batchId")
}
