package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import RelationalQueries.T

/** Similarity search over the `embeddings` table (Array[Float], 64-dim):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path (candidates only within matching
  * buckets). Dot products via zip_with + aggregate — codegen'd built-ins,
  * no UDF.
  */
object VectorQueries {

  /** cosine similarity of two double arrays, evaluated left-to-right like
    * DuckDB's list_cosine_similarity (element order fixed → deterministic).
    * Malformed inputs → NULL, same contract as the native CosineSim:
    * length mismatch or null element → zip_with pads/propagates null;
    * zero vector (0/0 = NaN) → nanvl to null.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    val d = dot(a, b); val na = dot(a, a); val nb = dot(b, b)
    // explicit zero-norm guard (ANSI mode: 0/0 raises, and NaN would differ
    // from the native form's null); lazy CaseWhen keeps the division safe
    when(na === 0 || nb === 0, lit(null).cast("double"))
      .otherwise(nanvl(d / (sqrt(na) * sqrt(nb)), lit(null).cast("double")))
  }

  private def emb(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "embeddings").select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** exact brute-force top-k neighbours for a fixed query subset; ties
    * broken by neighbour id so the ranking is total.
    *
    * SCALE CONTRACT: this is the EXACTNESS BASELINE, not a path — the join
    * is deliberately O(nQueries × |corpus|), bounded only by the explicit
    * nQueries cap (20). It exists to define correctness for q27 (the LSH
    * path, whose candidate set is ~2^-bits of the corpus per table) and to
    * give the oracle an exactly-computable target. Never run it with an
    * unbounded query side.
    */
  def q26AnnBrute(s: SparkSession, dir: String, nQueries: Int = 20, k: Int = 5): DataFrame = {
    graft.functions.native.register(s)
    val q = emb(s, dir).where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = emb(s, dir).select(col("vec_id").as("nid"), col("v").as("cv"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .withColumn("sim", graft.functions.native.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("sim"), 3).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** Multi-table random-hyperplane LSH: L independent tables of b sign
    * bits each (fixed hyperplanes from a seeded PRNG at plan-build time —
    * literals in the plan, no runtime randomness). A vector lands in one
    * bucket per table; candidates = union over tables of same-bucket
    * vectors, deduped, then exactly scored (candidates-then-verify).
    * The 100 TB path: b controls candidate-set shrinkage per table
    * (~2^-b of the corpus), L controls recall (1-(1-p^b)^L); the shuffle
    * stays a plain equi-join on (table, bucket).
    */
  def lshBuckets(v: Column, tables: Seq[Seq[Array[Double]]]): Column = {
    // array of per-table bucket ids: table index in the high bits.
    // Round-8: the per-plane aggregate(zip_with(...)) lambdas evaluated
    // interpreted (nTables × bits × dim virtual calls per row); the native
    // LshBucketIds expression runs the same left-to-right dot products as
    // a tight codegen'd Java loop — value-identical buckets (guide §4).
    require(tables.nonEmpty && tables.forall(_.size == tables.head.size),
      "lshBuckets: tables must be non-empty and uniform")
    import org.apache.spark.sql.graft.Internals
    Internals.column(graft.functions.LshBucketIds(
      Internals.expr(v), tables.flatten.toArray, tables.size, tables.head.size))
  }

  def tables(nTables: Int, bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nTables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** candidate ID pairs (directed q → c) via multi-table LSH. The bucket
    * self-join and pair dedup run on IDS ONLY — the 64-dim vectors are
    * re-attached by the caller to the (few) surviving candidates, so the
    * heavy columns never ride the candidate-generation shuffles.
    */
  private def lshCandidates(e: DataFrame, nTables: Int, bits: Int): DataFrame = {
    val ts = tables(nTables, bits, 64)
    val withB = e.select(col("vec_id"), explode(lshBuckets(col("v"), ts)).as("bucket"))
    val q = withB.select(col("vec_id").as("qid"), col("bucket"))
    val c = withB.select(col("vec_id").as("nid"), col("bucket"))
    q.join(c, Seq("bucket")).where(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
  }

  /** ANN via LSH, with the exact verification stage oracle-checked: the
    * hash-dependent candidate pairs are dumped to a fixture; scoring +
    * per-query top-k run from the re-read fixture, and the DuckDB oracle
    * recomputes exactly that from the same fixture + embeddings table.
    */
  def q27AnnLsh(s: SparkSession, dir: String, nTables: Int = 8, bits: Int = 4, k: Int = 5): DataFrame = {
    graft.functions.native.register(s)
    val e = emb(s, dir)
    val cand0 = lshCandidates(e, nTables, bits).where(col("qid") < 20)
    val cand = Fixtures.dump(cand0,
        s"${CdcQueries.FixtureRoot}/q27_cands_${Fixtures.sfTag(dir)}")
      .join(e.select(col("vec_id").as("qid"), col("v").as("qv")), Seq("qid"))
      .join(e.select(col("vec_id").as("nid"), col("v").as("cv")), Seq("nid"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    cand.withColumn("sim", graft.functions.native.cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("sim"), 3).as("sim"))
      .orderBy("qid", "rnk")
  }

  /** The documents' embeddings are unit-norm random vectors (max random
    * pairwise cosine ≈ 0.46), so a 0.95-near-dup query over the raw table
    * proves nothing. The corpus is AUGMENTED with deterministic planted
    * near-duplicates — vec_id < 40 re-emitted as id+1000000 with +0.125 on
    * element 0 (cosine ≥ 0.992 to the original for unit vectors, far above
    * threshold, so 8×4-bit LSH recall is ~1-3e-7 per pair) — the identical
    * expression the DuckDB oracle applies. Candidate pairs are dumped like
    * q27; every output row is oracle-verified exact cosine.
    */
  def q28EmbeddingDup(s: SparkSession, dir: String, threshold: Double = 0.95): DataFrame = {
    graft.functions.native.register(s)
    val e = emb(s, dir)
    val planted = e.where(col("vec_id") < 40).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("v"), (x, i) => when(i === 0, x + lit(0.125d)).otherwise(x)).as("v"))
    val aug = e.unionByName(planted)
    val cand0 = lshCandidates(aug, nTables = 8, bits = 4).where(col("qid") < col("nid"))
    Fixtures.dump(cand0,
        s"${CdcQueries.FixtureRoot}/q28_cands_${Fixtures.sfTag(dir)}")
      .join(aug.select(col("vec_id").as("qid"), col("v").as("qv")), Seq("qid"))
      .join(aug.select(col("vec_id").as("nid"), col("v").as("cv")), Seq("nid"))
      .withColumn("sim", graft.functions.native.cosine(col("qv"), col("cv")))
      .where(col("sim") >= threshold)
      .select(col("qid").as("ida"), col("nid").as("idb"), round(col("sim"), 4).as("sim"))
      .orderBy("ida", "idb")
  }

  private val embSrc = s"read_parquet('/root/testdata/${Fixtures.oracleSfTag}/embeddings.parquet')"

  val oracles: Map[String, String] = Map(
    "q26_ann_brute" -> """
      SELECT qid, rnk, nid, sim FROM (
        SELECT q.vec_id AS qid, c.vec_id AS nid,
               round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 3) AS sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id) AS rnk
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 20)
      WHERE rnk <= 5 ORDER BY qid, rnk""",
    // verify stage of the LSH path: exact cosine top-k over the dumped
    // candidate pairs (generation recall pinned in VectorOpsSpec)
    "q27_ann_lsh" -> s"""
      WITH cand AS (SELECT qid, nid FROM read_parquet('${CdcQueries.FixtureRoot}/q27_cands_${Fixtures.oracleSfTag}/*.parquet'))
      SELECT qid, rnk, nid, sim FROM (
        SELECT c.qid, c.nid,
               round(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]), 3) AS sim,
               row_number() OVER (PARTITION BY c.qid
                 ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) DESC, c.nid) AS rnk
        FROM cand c JOIN $embSrc q ON q.vec_id = c.qid
                    JOIN $embSrc n ON n.vec_id = c.nid)
      WHERE rnk <= 5 ORDER BY qid, rnk""",
    // near-dup verify stage: same planted-duplicate augmentation, exact
    // cosine + threshold over the dumped candidates
    "q28_embedding_dup" -> s"""
      WITH aug AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM $embSrc
        UNION ALL
        SELECT vec_id + 1000000,
               [CASE WHEN i = 1 THEN v[i] + 0.125 ELSE v[i] END FOR i IN generate_series(1, len(v))]
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM $embSrc WHERE vec_id < 40)),
      cand AS (SELECT qid, nid FROM read_parquet('${CdcQueries.FixtureRoot}/q28_cands_${Fixtures.oracleSfTag}/*.parquet'))
      SELECT c.qid AS ida, c.nid AS idb,
             round(list_cosine_similarity(a.v, b.v), 4) AS sim
      FROM cand c JOIN aug a ON a.id = c.qid JOIN aug b ON b.id = c.nid
      WHERE list_cosine_similarity(a.v, b.v) >= 0.95
      ORDER BY ida, idb"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_ann_brute" -> ((s: SparkSession, d: String) => q26AnnBrute(s, d)),
    "q27_ann_lsh" -> ((s: SparkSession, d: String) => q27AnnLsh(s, d)),
    "q28_embedding_dup" -> ((s: SparkSession, d: String) => q28EmbeddingDup(s, d))
  )
}
