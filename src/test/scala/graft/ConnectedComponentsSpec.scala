package graft

import graft.operators.ConnectedComponents

/** pair→cluster correctness on planted graphs (exact expected components). */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.clusters(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("disjoint pairs, a chain, and a clique resolve to min-id clusters") {
    val edges = Seq(
      (1L, 2L),                               // pair
      (10L, 11L), (11L, 12L), (12L, 13L),     // chain of 4
      (20L, 21L), (20L, 22L), (21L, 22L),     // triangle
      (31L, 30L)                              // reversed pair
    )
    val got = cc(edges)
    assert(got == Map(
      1L -> 1L, 2L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L))
  }

  test("bridge edge merges two clusters") {
    val base = Seq((1L, 2L), (3L, 4L))
    assert(cc(base).values.toSet == Set(1L, 3L))
    assert(cc(base :+ (2L, 3L)).values.toSet == Set(1L))
  }

  /** run `f` with the small-graph fast path disabled (distributed loop) */
  private def distributed[A](f: => A): A = {
    spark.conf.set("spark.graft.cc.localMaxEdges", "0")
    try f finally spark.conf.unset("spark.graft.cc.localMaxEdges")
  }

  test("long chain needs multiple rounds but converges (and maxIter trips when too low)") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    val got = distributed(cc(chain))
    assert(got.values.toSet == Set(0L) && got.size == 41)
    intercept[IllegalArgumentException] {
      import spark.implicits._
      distributed(ConnectedComponents.clusters(chain.toDF("a", "b"), maxIter = 2).collect())
    }
  }

  test("ADVERSARIAL: a 10k-node path graph converges within O(log d) rounds") {
    // worst case for plain min-label propagation (diameter = rounds);
    // pointer jumping must close a 10^4 diameter in ~log2 rounds, well
    // under the default maxIter=25 — forced onto the distributed loop
    // (the small-graph fast path would otherwise absorb it)
    import org.apache.spark.sql.functions._
    val edges = spark.range(0, 9999).select(col("id").as("a"), (col("id") + 1).as("b"))
    val labels = distributed(ConnectedComponents.clusters(edges))
    val agg = labels.agg(count(lit(1)), countDistinct(col("cluster")), min("cluster")).collect().head
    assert(agg.getLong(0) == 10000L && agg.getLong(1) == 1L && agg.getLong(2) == 0L)
  }

  test("driver union-find fast path == distributed pointer jumping (random graphs)") {
    // round-8: below spark.graft.cc.localMaxEdges the components come from
    // a driver-side union-find — identical min-id labelling, no jobs
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(200)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      assert(cc(edges) == distributed(cc(edges)),
        "fast path must label identically to the distributed loop")
    }
  }

  test("reliable-checkpoint mode (executor-loss-tolerant) gives identical clusters") {
    spark.sparkContext.setCheckpointDir(tmpDir("cc_ckpt"))
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 5L)).toDF("a", "b")
    val loc = ConnectedComponents.clusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = ConnectedComponents.clusters(edges, reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel == loc && rel == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 5L -> 5L))
  }
}
