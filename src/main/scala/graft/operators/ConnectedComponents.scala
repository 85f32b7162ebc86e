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
