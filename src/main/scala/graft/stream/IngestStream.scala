package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas
import graft.table.LakeTable

/** Structured Streaming WAL tail → lake upsert (SURVEY.md §7.3, §2.1 S8).
  *
  * The WAL is a directory of ordered parquet segment files (FIXTURES.md §2);
  * the file source's checkpointed offset is the segment index —
  * `maxFilesPerTrigger` is the batch governor (the reference's chunk_size
  * knob, config/analysis_config.yaml:62). Each micro-batch is applied via
  * `foreachBatch { merge }`: per-(repo,path) LSN-ordered dedup, bucket-pruned
  * upsert, idempotent (checkpointId, batchId) commit — exactly-once across
  * restarts. Watermarking contract (SURVEY.md §2.10): events are admitted by
  * the max-LSN guard inherent to the merge, so "late" (lower-LSN) events are
  * correct no-ops rather than corruption; the ledger counts them implicitly
  * via bucket row deltas.
  */
object IngestStream {

  /** Start the ingest stream. `cpId` identifies the stream for exactly-once;
    * `checkpointDir` is the Spark streaming checkpoint (offsets + commits).
    */
  def start(spark: SparkSession, walDir: String, table: LakeTable, cpId: String,
            checkpointDir: String, maxFilesPerTrigger: Int = 4,
            watermarkDelay: String = "10 minutes",
            autoCompactFilesPerBucket: Int = 16,
            onBatch: (Long, Seq[LakeTable.BucketStats]) => Unit = (_, _) => ()): StreamingQuery = {
    val src = spark.readStream
      .schema(Schemas.changeEvent)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(walDir)
    // event-time watermark contract (SURVEY.md §2.10): correctness does
    // NOT depend on it (the merge's max-LSN guard makes stale events
    // no-ops in any order) — it declares the expected lateness bound,
    // and the ledger's staleRows counts what actually arrived late.
    val marked = if (watermarkDelay.nonEmpty) src.withWatermark("ts", watermarkDelay) else src
    marked
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // merge writes the lineage ledger entry itself, inside the commit
        val stats = table.merge(batch, cpId, batchId)
        // maintenance: MergeOnRead folds deltas when read amplification
        // grows; DeletionVector folds when the dead-position fraction does
        if (autoCompactFilesPerBucket > 0) table.maybeCompact(autoCompactFilesPerBucket)
        onBatch(batchId, stats)
      }
      .start()
  }

  /** Run the whole available WAL synchronously (batch-style driver for
    * tests/bench): start, await completion, stop.
    */
  def runAvailable(spark: SparkSession, walDir: String, table: LakeTable, cpId: String,
                   checkpointDir: String, maxFilesPerTrigger: Int = 4,
                   onBatch: (Long, Seq[LakeTable.BucketStats]) => Unit = (_, _) => ()): Unit = {
    val q = start(spark, walDir, table, cpId, checkpointDir, maxFilesPerTrigger, onBatch = onBatch)
    q.awaitTermination()
  }
}
