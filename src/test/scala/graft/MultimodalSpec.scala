package graft

import org.apache.spark.sql.functions._

import graft.queries.MultimodalQueries

/** Multimodal binary-column plumbing: the decode is a stub (no codec libs
  * in this image) but the Spark-side contract is tested for real — binary
  * schema, metadata struct, deterministic feature extraction, batch shape.
  */
class MultimodalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("media table has the binary+metadata contract") {
    val m = MultimodalQueries.mediaTable(spark, dir)
    val sch = m.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    val row = m.where(col("media_id") === 0).collect().head
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(Set("image", "audio", "video").contains(meta.getAs[String]("media_type")))
    assert(meta.getAs[Long]("n_bytes") > 0)
  }

  test("fake decode features are deterministic and bounded [0,1]") {
    val m = MultimodalQueries.mediaTable(spark, dir)
      .withColumn("features", MultimodalQueries.fakeFeatures(col("payload")))
    val a = m.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val b = MultimodalQueries.mediaTable(spark, dir).repartition(5)
      .withColumn("features", MultimodalQueries.fakeFeatures(col("payload")))
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(a == b, "deterministic across partitionings")
    assert(a.values.flatten.forall(v => v >= 0.0 && v <= 1.0))
    assert(a.values.forall(_.size == 4))
  }

  test("payload round-trips: decode(payload) == original text bytes") {
    val m = MultimodalQueries.mediaTable(spark, dir)
      .withColumn("text_back", decode(col("payload"), "utf-8"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"), col("text"))
    val bad = m.join(docs, "media_id").where(col("text_back") =!= col("text")).count()
    assert(bad == 0)
  }
}
