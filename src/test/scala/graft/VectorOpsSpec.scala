package graft

import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** Oracles for similarity search: cosine against hand-computed values,
  * LSH-ANN recall against the brute-force baseline on real embeddings.
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches hand-computed values") {
    val df = Seq(
      (1L, Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (2L, Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (3L, Seq(1.0, 2.0), Seq(2.0, 4.0), 1.0),
      (4L, Seq(3.0, 4.0), Seq(4.0, 3.0), 24.0 / 25.0)
    ).toDF("id", "a", "b", "expected")
    val got = df.select(col("id"), VectorQueries.cosine(col("a"), col("b")).as("c"), col("expected"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12, s"id=${r.getLong(0)}"))
  }

  test("LSH ANN recall@5 vs brute force on sf0.001 embeddings") {
    val dir = "/root/testdata/sf0.001"
    val brute = VectorQueries.q26AnnBrute(spark, dir, nQueries = 20, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorQueries.q27AnnLsh(spark, dir, nTables = 8, bits = 4, k = 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    // 8 tables x 4 bits over 500 vecs: candidates ~half the corpus on
    // near-random data; assert the deterministic floor for this seed.
    assert(recall >= 0.5, s"recall@5 $recall below floor")
    assert(lsh.nonEmpty)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val df = VectorQueries.q28EmbeddingDup(spark, "/root/testdata/sf0.001", threshold = 0.5)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall(r => r._1 < r._2), "canonical pair order")
    assert(rows.forall(_._3 >= 0.5))
  }
}
