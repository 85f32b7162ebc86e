package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** `private[sql]` access shim for the V1 streaming-sink contract: the
  * DataFrame handed to `Sink.addBatch` carries the STREAMING logical plan,
  * so any derived transformation re-enters the batch analyzer and fails
  * with "Queries with streaming sources must be executed with
  * writeStream.start()". The sanctioned escape (what Delta's `DeltaSink`
  * does through `IncrementalExecution`) is to re-wrap the already-planned
  * physical RDD as a plain batch frame — no re-analysis, no extra
  * ser/deser. Downstream actions re-execute that RDD; the graft tail's
  * partitions are deterministic, so multi-action consumers (the merge)
  * stay correct.
  */
object MicroBatch {
  def rebase(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[CDataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[CSparkSession]
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
