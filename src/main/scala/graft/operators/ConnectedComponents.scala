package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the pair→cluster step a real
  * dedup pipeline needs after near-dup pair generation (choose one
  * canonical document per duplicate cluster).
  *
  * Min-label propagation with pointer jumping: every node starts labelled
  * with itself; each round (1) takes the min label over its neighbourhood
  * (one edges ⋈ labels hash join + min-aggregate) and (2) jumps pointers —
  * label(u) := label(label(u)) — which doubles how far a minimum has
  * spread. Rounds = O(log diameter); for dedup graphs (near-cliques of
  * duplicates, diameter 2-4) that is 2-3 shuffle rounds regardless of
  * corpus size. Every shape in the loop is a plain hash join / aggregate —
  * no all-pairs, no driver-side graph. maxIter guards the loop.
  *
  * Each round is localCheckpoint()ed: O(1) lineage, deterministic results.
  */
object ConnectedComponents {

  /** edges: two long columns (a, b), undirected. Returns (node, cluster)
    * where cluster = min node id of the component (the canonical member).
    *
    * `reliable = true` switches the per-round checkpoint to a RELIABLE one
    * (`df.checkpoint()` into `spark.sparkContext.setCheckpointDir`), which
    * survives executor loss — the option a long-running cluster job wants;
    * localCheckpoint (default) is the fast single-box path.
    */
  def clusters(edges: DataFrame, a: String = "a", b: String = "b",
               maxIter: Int = 25, reliable: Boolean = false): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val spark = edges.sparkSession
    // SMALL-GRAPH fast path (round-8; the tombstone/DV driver-decode
    // pattern): a near-dup pair list is usually tiny relative to the
    // corpus, and each distributed round costs several jobs of fixed
    // scheduling latency. Below `spark.graft.cc.localMaxEdges` edges
    // (default 100k — the limit+collect is bounded BEFORE anything lands
    // on the driver) the components come from a driver-side union-find
    // with min-id representatives: the identical (node, min reachable id)
    // labelling, microseconds instead of 2-3 shuffle rounds. Larger
    // graphs take the distributed pointer-jumping loop below, unchanged.
    val localMax = spark.conf.getOption("spark.graft.cc.localMaxEdges")
      .map(_.toInt).getOrElse(100000)
    val bounded = edges
      .select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .limit(localMax + 1).collect()
    // null endpoints (malformed input) keep the distributed path's
    // semantics (they never join) rather than a driver NPE
    if (bounded.length <= localMax && bounded.forall(r => !r.isNullAt(0) && !r.isNullAt(1))) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      bounded.foreach { row =>
        val u = row.getLong(0); val v = row.getLong(1)
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        // min id wins the union: the root IS the canonical member
        if (ru < rv) parent(rv) = ru else if (rv < ru) parent(ru) = rv
      }
      val rows = parent.keys.toSeq.sorted.map(n => (n, find(n)))
      import spark.implicits._
      return rows.toDF("node", "cluster")
    }
    val und = ckpt(edges.select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .union(edges.select(col(b).cast("long").as("u"), col(a).cast("long").as("v")))
      .distinct())
    var labels = und.select(col("u").as("node")).distinct()
      .withColumn("cluster", col("node"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      iter += 1
      // (1) min over the neighbourhood
      val nbrMin = und.join(labels.select(col("node").as("v"), col("cluster")), Seq("v"))
        .groupBy(col("u").as("node")).agg(min("cluster").as("nbr"))
      val step = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("cluster").as("prev"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("cluster"))
      // (2) pointer jump: follow the label's own label (labels are node ids).
      // The round's OLD label rides along as `prev`, so the convergence
      // check below is a count over the checkpointed blocks — the previous
      // shape re-joined `next` against `labels`, paying an extra shuffle
      // per round for a boolean (round-8, guide §2.4).
      val next = ckpt(step
        .join(step.select(col("node").as("cluster"), col("cluster").as("c2")),
          Seq("cluster"), "left")
        .select(col("node"), col("prev"),
          least(col("cluster"), coalesce(col("c2"), col("cluster"))).as("cluster")))
      // changed = any label lowered this round (by either step)
      changed = next.where(col("cluster") < col("prev")).count()
      labels = next.select("node", "cluster")
    }
    require(changed == 0, s"connected components did not converge in $maxIter rounds")
    labels
  }
}
