package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Oracles for the hash-dependent text/dedup ops (SURVEY.md §5.2 suite 6):
  * shingling vs a hand-computed fixture; MinHash+LSH precision (by
  * construction) and recall against a brute-force Jaccard scan; SimHash
  * locality properties.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles match the hand-computed n-grams") {
    val df = Seq((1L, "a b c d e"), (2L, "x y"), (3L, "p q r")).toDF("doc_id", "text")
      .select(col("doc_id"), TextQueries.shingles(TextQueries.tokens(col("text")), 3).as("sh"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("a b c", "b c d", "c d e"))
    assert(got(2L) == Nil) // shorter than n
    assert(got(3L) == List("p q r"))
  }

  test("minhash LSH finds near-dups, skips unrelated, exact-verifies pairs") {
    // A/B near-identical (1 word changed), C identical to A, D unrelated.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val mutated = ((1 to 20).map(i => s"w$i") ++ Seq("CHANGED") ++ (22 to 40).map(i => s"w$i")).mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, base), (2L, mutated), (3L, base), (4L, other))
      .toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(TextQueries.shingles(TextQueries.tokens(col("text")), 3)).as("sh"))
    val pairs = TextQueries.minhashPairs(docs, k = 16, rows = 4, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 3L)), "exact dup pair found")
    assert(pairs.find(p => (p._1, p._2) == ((1L, 3L))).get._3 == 1.0)
    assert(keys.contains((1L, 2L)) && keys.contains((2L, 3L)), "near-dup pairs found")
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc has no pair")
  }

  test("minhash LSH recall vs brute-force Jaccard on the sf0.001 corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), array_distinct(TextQueries.shingles(TextQueries.tokens(col("text")), 3)).as("sh"))
      .where(size(col("sh")) > 0).persist()
    try {
      val lsh = TextQueries.minhashPairs(docs, k = 16, rows = 4, threshold = 0.5)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force ground truth
      val a = docs.select(col("doc_id").as("ida"), col("sh").as("sa"))
      val b = docs.select(col("doc_id").as("idb"), col("sh").as("sb"))
      val truth = a.crossJoin(b).where(col("ida") < col("idb"))
        .withColumn("j", size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))))
        .where(col("j") >= 0.5)
        .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(lsh.subsetOf(truth), "every reported pair is a true near-dup (exact verify)")
      if (truth.nonEmpty) {
        val recall = lsh.intersect(truth).size.toDouble / truth.size
        assert(recall >= 0.9, s"recall $recall (16 hashes, 4 bands @ j>=0.5 should catch ~all)")
      }
    } finally docs.unpersist()
  }

  test("simhash: identical texts collide; near texts are close; far texts far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 57).map(i => s"tok$i") ++ Seq("x", "y", "z")).mkString(" ")
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val got = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
      .select(col("id"), TextQueries.simhash64(TextQueries.tokens(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L), "identical text => identical simhash")
    assert(hamming(got(1L), got(3L)) < hamming(got(1L), got(4L)),
      "near text strictly closer than unrelated text")
    assert(hamming(got(1L), got(3L)) <= 16, "5% token change stays within 16/64 bits")
  }

  test("simhash is deterministic across partitionings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val a = df.coalesce(1).select(col("doc_id"), TextQueries.simhash64(TextQueries.tokens(col("text"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toList
    val b = df.repartition(7).select(col("doc_id"), TextQueries.simhash64(TextQueries.tokens(col("text"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toList
    assert(a == b)
  }
}
