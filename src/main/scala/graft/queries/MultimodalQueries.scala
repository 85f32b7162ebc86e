package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import RelationalQueries.T

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with a typed metadata struct, processed in a distributed, codegen-
  * friendly way. The actual image/audio decode is STUBBED (no codec libs in
  * this container) with a deterministic fake — features derived from the
  * payload's sha256 — but the Spark-side contract is real: binary schema,
  * size-aware partitioning, per-batch feature extraction, typed output.
  */
object MultimodalQueries {

  /** deterministic fake "decoder": 4 float features from sha256(payload).
    * Replace with a real codec behind the same Column signature.
    */
  def fakeFeatures(payload: Column): Column = {
    val hex = sha2(payload, 256)
    def feat(i: Int): Column =
      (conv(substring(hex, i * 8 + 1, 6), 16, 10).cast("double") / 16777215.0)
    array((0 until 4).map(feat): _*)
  }

  /** synthesise a media table from documents: payload = utf-8 bytes,
    * metadata = (media_type, n_bytes, sample_rate) — the shape a real
    * image/audio lake table would have.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        length(col("text")).cast("long").as("n_bytes"),
        lit(16000).as("sample_rate")).as("meta"))

  /** decode → feature-extract → aggregate per media type. Oracle-checked:
    * the deterministic fake decode (sha256-derived features) is reproduced
    * in DuckDB SQL, so the whole binary-column pipeline — payload encode,
    * typed metadata struct, per-type batching, feature extraction,
    * aggregation — is verified end-to-end; per-stage invariants (payload
    * round-trip, feature bounds) are additionally pinned in MultimodalSpec.
    */
  def q29Multimodal(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .repartition(col("meta.media_type")) // co-locate a type per partition batch
      .withColumn("features", fakeFeatures(col("payload")))
      .groupBy(col("meta.media_type").as("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"))
      .orderBy("media_type")

  val oracles: Map[String, String] = Map(
    // the fake decoder replayed in SQL: f0 = int(first 6 hex chars of
    // sha256(payload)) / 0xFFFFFF — exact integer arithmetic, one double
    // division, identical in both engines
    "q29_multimodal" -> """
      SELECT media_type, count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS total_bytes,
             round(avg(f0), 6) AS avg_f0
      FROM (
        SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
               text,
               list_aggregate([(strpos('0123456789abcdef', hx[i]) - 1) * CAST(pow(16, 6 - i) AS BIGINT) FOR i IN range(1, 7)], 'sum') / 16777215.0 AS f0
        FROM (SELECT doc_id, text, sha256(text) AS hx FROM documents))
      GROUP BY 1 ORDER BY 1"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal" -> q29Multimodal _
  )
}
