package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import RelationalQueries.T

/** Text-analysis + deduplication battery over `documents` — the operations
  * a large-scale training-data pipeline needs: exact dedup, fingerprinting,
  * token/quality stats, language-ID heuristics, n-gram Jaccard, and
  * MinHash+LSH / SimHash near-dup (the latter two oracle-less: they depend
  * on Spark's xxhash64, verified against hand-computed fixtures in
  * TextOpsSpec instead).
  *
  * Everything is built from codegen'd built-ins and higher-order functions
  * (transform / aggregate / zip_with) — no UDFs — so whole-stage codegen
  * spans the hot path and all ops scale by plain hash-shuffle.
  */
object TextQueries {

  /** whitespace tokenisation shared by all text ops */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  // ---- oracle-backed ------------------------------------------------------

  // sha256 per-row invariant (the engine's content_sha) over a neutral table.
  def q17ShaDocs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), countDistinct(sha2(col("text"), 256)).as("n_sha"))
      .orderBy("lang")

  // exact deduplication: hash-groupBy on md5(text) — dup_rows per lang.
  def q18DedupExact(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("dup_rows"))
      .orderBy("lang")

  // token counting + length stats per lang.
  def q19TokenStats(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("toks"), length(col("text")).cast("long").as("chars"))
      .groupBy("lang")
      .agg(sum("toks").as("total_tokens"), round(avg("chars"), 4).as("avg_chars"))
      .orderBy("lang")

  // quality scoring: alpha-and-space ratio + mean token length.
  def q20Quality(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("lang"),
        (length(regexp_replace(col("text"), "[^a-z ]", "")).cast("double") / length(col("text"))).as("alpha_ratio"),
        (length(col("text")).cast("double") / size(tokens(col("text")))).as("chars_per_tok"))
      .groupBy("lang")
      .agg(round(avg("alpha_ratio"), 6).as("avg_alpha"), round(avg("chars_per_tok"), 6).as("avg_ctok"))
      .orderBy("lang")

  // language-ID heuristic: stopword-pattern rules (n-gram heuristic per the
  // brief); a CASE chain like the engine's lang rule table, cross-checked
  // against the dataset's own lang label.
  def q21LangId(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val predicted = when(t.like("% the %") || t.like("% a %") || t.like("% of %"), "en")
      .when(t.like("% der %") || t.like("% und %") || t.like("% die %"), "de")
      .when(t.like("% le %") || t.like("% la %") || t.like("% et %"), "fr")
      .otherwise("und")
    T(s, dir, "documents")
      .withColumn("predicted", predicted)
      .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  // document fingerprinting: md5 over whitespace-normalised lowercase text;
  // duplicate-fingerprint mass per source.
  def q22Fingerprint(s: SparkSession, dir: String): DataFrame = {
    val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    T(s, dir, "documents")
      .withColumn("fp", fp)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_fp"))
      .orderBy("source")
  }

  // n-gram (word 3-shingle) Jaccard candidate pairs: explode distinct
  // shingles, drop high-document-frequency shingles (bounds the self-join
  // fan-out at scale — candidates-then-verify, SURVEY.md §4), equi-join on
  // shingle, count shared per pair. Fully shuffle-parallel by shingle.
  def q23ShinglePairs(s: SparkSession, dir: String): DataFrame = {
    // Round-8 shape (guide §2.4): hash-partition the exploded shingles by
    // `sh` ONCE — the per-doc dedup, the document-frequency cap (a window
    // over sh replacing the old groupBy + re-join) and BOTH sides of the
    // self-join all ride that single partitioning (HashPartitioning(sh)
    // satisfies each later clustering/join distribution), so the old
    // distinct + df-groupBy + semi-join chain of exchanges collapses to
    // one exchange before the join and one for the final pair rollup.
    // shingles generate EXPLODED through codegen'd built-ins (see q24) —
    // the per-doc transform/slice lambda evaluated interpreted
    val ws = col("ws")
    val filtered = T(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .where(size(ws) >= 3)
      .select(col("doc_id"), ws, explode(sequence(lit(1), size(ws) - 2)).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(ws, col("i")), element_at(ws, col("i") + 1),
        element_at(ws, col("i") + 2)).as("sh"))
      .repartition(col("sh"))
      .dropDuplicates("sh", "doc_id")
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .where(col("df") <= 20).drop("df")
    val a = filtered.as("a"); val b = filtered.as("b")
    a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 10)
      .orderBy("doc_a", "doc_b")
  }

  /** word n-shingles via higher-order functions (no UDF):
    * transform(sequence(0, size-n), i -> concat_ws(' ', slice(ws, i+1, n)))
    */
  def shingles(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))

  // ---- oracle-less (hash-dependent; verified in TextOpsSpec) -------------

  /** MinHash signature: k independent min-hashes over the shingle set,
    * each xxhash64 seeded by the hash index — array_min over a transform,
    * all codegen'd.
    */
  def minhashSig(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, x => xxhash64(i, x))))

  /** MinHash + LSH banding: signatures split into bands of `rows` hashes;
    * docs sharing any band bucket are candidate near-dups; candidates are
    * verified with exact shingle-set Jaccard (candidates-then-verify).
    */
  def q24MinhashLsh(s: SparkSession, dir: String,
                    k: Int = 16, rows: Int = 4, threshold: Double = 0.4): DataFrame = {
    // Round-8: shingles are generated EXPLODED through codegen'd built-ins
    // (generate over a primitive int sequence + element_at/concat_ws per
    // row) instead of the per-doc transform/slice lambda — higher-order
    // functions evaluate their lambdas interpreted, one virtual call per
    // element, and that generation dominated the old runtime (guide §4:
    // keep the hot path inside whole-stage codegen). Same shingle strings,
    // same downstream hashes.
    val ws = col("ws")
    val exploded = T(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .where(size(ws) >= 3)
      .select(col("doc_id"), ws, explode(sequence(lit(1), size(ws) - 2)).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(ws, col("i")), element_at(ws, col("i") + 1),
        element_at(ws, col("i") + 2)).as("s"))
    // candidate pairs dumped so the DuckDB oracle verifies the exact-Jaccard
    // stage end-to-end (banding itself is xxhash64-dependent → ScalaTest)
    minhashPairsExploded(exploded, k, rows, threshold,
      dumpPath = Some(s"${CdcQueries.FixtureRoot}/q24_cands_${Fixtures.sfTag(dir)}"))
  }

  /** core MinHash+LSH pipeline over (doc_id, sh: array<string>) — split out
    * so tests can feed hand-built corpora. `dumpPath` materialises the
    * candidate ID pairs for the oracle's independent verify stage.
    */
  def minhashPairs(docsIn: DataFrame, k: Int, rows: Int, threshold: Double,
                   dumpPath: Option[String] = None): DataFrame =
    minhashPairsExploded(
      docsIn.select(col("doc_id"), explode(col("sh")).as("s")), k, rows, threshold, dumpPath)

  /** The pipeline proper, over EXPLODED (doc_id, s: string) shingle rows
    * (round-8 shape). Signatures over the shingle SET become plain hash
    * aggregates — min-hash per seed is `min(xxhash64(seed, s))` with
    * map-side combine, fully codegen'd, replacing the interpreted
    * k × |sh| lambda evaluations of the array form — and the exact-Jaccard
    * verify stage computes |A∩B| by joining the (few) candidate pairs back
    * to the shingle rows and |A∪B| = |A| + |B| − |A∩B| from per-doc
    * counts carried on the signature aggregate, replacing the interpreted
    * array_intersect/array_union. Hash values, candidate set, jaccard
    * doubles and output rows are identical to the array form.
    */
  def minhashPairsExploded(shIn: DataFrame, k: Int, rows: Int, threshold: Double,
                           dumpPath: Option[String] = None): DataFrame = {
    // materialise the distinct shingle rows once — they feed the signature
    // aggregate and the verify stage's intersection join. localCheckpoint
    // (eager) rather than persist: blocks are freed with the RDD by the
    // ContextCleaner instead of squatting in the cache manager forever.
    val sh = shIn.dropDuplicates("doc_id", "s").localCheckpoint()
    val sigCols = (0 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"__m$i")) :+
      count(lit(1)).as("__nsh")
    // per-doc minhash signature + distinct-shingle count in ONE aggregate
    val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*).localCheckpoint()
    val sigArr = array((0 until k).map(i => col(s"__m$i")): _*)
    // band → bucket join on IDs ONLY: heavy columns do NOT ride the
    // self-join/dedup shuffle (candidates-then-verify).
    val bandCols = (0 until k / rows).map(b =>
      struct(lit(b).as("band"), hash(slice(sigArr, b * rows + 1, rows)).as("bh")))
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val a = bands.as("a"); val b = bands.as("b")
    val cand0 = a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val cand = dumpPath.fold(cand0)(p => Fixtures.dump(cand0, p))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("__i"))
    val counts = sig.select(col("doc_id"), col("__nsh"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(counts.select(col("doc_id").as("doc_a"), col("__nsh").as("__na")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("__nsh").as("__nb")), Seq("doc_b"))
      .withColumn("inter", coalesce(col("__i"), lit(0L)).cast("double"))
      .withColumn("uni", (col("__na") + col("__nb") - coalesce(col("__i"), lit(0L))).cast("double"))
      .where(col("inter") / col("uni") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("inter") / col("uni"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash over the token multiset, via higher-order aggregate:
    * per token, xxhash64 bits vote +1/-1 into 64 counters; the sign vector
    * is reassembled into one BIGINT. All built-ins — codegen'd end to end.
    */
  def simhash64(toks: Column): Column = {
    // shiftright/shiftleft take an Int literal in the Scala API; inside a
    // lambda the shift amount is a Column, so call the SQL function directly.
    def shr(c: Column, i: Column) = call_function("shiftright", c, i)
    def shl(c: Column, i: Column) = call_function("shiftleft", c, i)
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, transform(sequence(lit(0), lit(63)),
        i => shr(xxhash64(t), i).bitwiseAND(lit(1L))),
        (a, bit) => a + bit * 2L - 1L))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)), (c, i) => when(c > 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** pair→cluster dedup: connected components over the verified near-dup
    * pairs (q24's output), each node labelled with its cluster's canonical
    * (min) doc id. Oracle: DuckDB recursive-CTE transitive closure over the
    * same verified pair set.
    */
  def q31DupClusters(s: SparkSession, dir: String): DataFrame =
    graft.operators.ConnectedComponents
      .clusters(q24MinhashLsh(s, dir), a = "doc_a", b = "doc_b")
      .select(col("node").as("doc_id"), col("cluster"))
      .orderBy("doc_id")

  def q25Simhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.native.register(s)
    T(s, dir, "documents")
      .select(col("doc_id"), graft.functions.native.simhash64(tokens(col("text"))).as("simhash"))
      .groupBy("simhash").agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .where(col("n") >= 1)
      .orderBy(col("n").desc, col("simhash"))
      .limit(50)
  }

  /** Exact-substring dedup (the Lee-et-al "Deduplicating Training Data"
    * suffix-array modality, re-expressed Spark-native): a duplicated
    * substring of length >= L always contains a duplicated L-gram, and a
    * duplicated L-gram IS a duplicated substring of length L — so grouping
    * the xxhash64'd sliding L-char windows finds exactly the documents
    * sharing >= L consecutive chars with another document. Windows travel
    * as 8-byte hashes (never 64-char strings), duplicate detection is one
    * hash groupBy with map-side combine, and the re-join is LINEAR in gram
    * occurrences (no pairwise blowup) — the shape survives a 100x corpus.
    * L = 64 chars ~ the paper's 50-BPE-token threshold. Output: per doc,
    * the number of distinct duplicated windows it contains.
    */
  def q52SubstringDedup(s: SparkSession, dir: String): DataFrame = {
    val L = 64
    // Gram identity is ONE xxhash64 value (round-8). The previous shape
    // carried a second "independent" hash, `xxhash64(gram, lit(L))` — but
    // Spark's multi-argument xxhash64 CHAINS: it hashes the first child,
    // then hashes the second child USING THAT RESULT AS THE SEED, so
    // h2 = XXH64(L, seed = h1) is a deterministic function of h1. Equal
    // h1 ⇒ equal h2, always: the pair discriminated exactly as much as h1
    // alone (grouping by (h1, h2) ≡ grouping by h1, provably — results
    // identical), while costing 8 extra bytes per gram through the
    // shuffle and struct comparisons in the dedup/window instead of
    // primitive longs. The honest collision budget is therefore 64-bit
    // either way (~3e-6 birthday odds at this corpus's ~1e7 grams); a
    // TRUE 128-bit identity for web-corpus scale (~1e14 grams) needs a
    // second hash under an INDEPENDENT seed — Catalyst's XxHash64 takes a
    // seed but functions.xxhash64 pins 42 — at the measured price of one
    // more 64-byte hash per window (~+45 % on this stage). Recorded here
    // rather than silently paying for bytes that bought nothing.
    //
    // Round-8 shape (guide §2.4/§1.2): positions explode as a primitive
    // int sequence and the hash is projected per row AFTER the
    // generate — no per-doc array-of-struct materialisation — and the
    // grams are hash-partitioned by `g` ONCE: the per-doc dedup
    // (dropDuplicates(g, doc_id)), the document-frequency count (a window
    // over g) and the duplicate filter all ride that one partitioning
    // (HashPartitioning(g) satisfies every later clustering), so the old
    // distinct + groupBy + re-join — three exchanges and a second full
    // gram computation — collapse to this single exchange plus the final
    // per-doc rollup.
    val gram = col("text").substr(col("i"), lit(L))
    val raw = T(s, dir, "documents").where(length(col("text")) >= L)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (L - 1))).as("i"))
      .select(col("doc_id"), xxhash64(gram).as("g"))
    val uniq = raw.repartition(col("g")).dropDuplicates("g", "doc_id")
    uniq
      .withColumn("nd", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .where(col("nd") >= 2)
      .groupBy("doc_id").agg(count(lit(1)).as("dup_windows"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    // same gram decomposition on the raw text (no hash needed in DuckDB)
    "q52_substring_dedup" -> """
      WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 64),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(u.i AS INT), 64) AS gram
            FROM d, LATERAL unnest(range(1, length(text) - 62)) AS u(i)),
      dup AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2)
      SELECT doc_id, count(*) AS dup_windows FROM g JOIN dup USING (gram)
      GROUP BY 1 ORDER BY 1""",
    "q17_sha_docs" -> """
      SELECT lang, count(*) AS n, count(DISTINCT sha256(text)) AS n_sha
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q18_dedup_exact" -> """
      SELECT lang, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct,
             count(*) - count(DISTINCT md5(text)) AS dup_rows
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q19_token_stats" -> """
      SELECT lang, CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
             round(avg(length(text)), 4) AS avg_chars
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q20_quality" -> """
      SELECT lang,
             round(avg(length(regexp_replace(text, '[^a-z ]', '', 'g'))::DOUBLE / length(text)), 6) AS avg_alpha,
             round(avg(length(text)::DOUBLE / len(string_split_regex(trim(text), '\s+'))), 6) AS avg_ctok
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q21_langid" -> """
      SELECT lang, CASE WHEN text LIKE '% the %' OR text LIKE '% a %' OR text LIKE '% of %' THEN 'en'
                        WHEN text LIKE '% der %' OR text LIKE '% und %' OR text LIKE '% die %' THEN 'de'
                        WHEN text LIKE '% le %' OR text LIKE '% la %' OR text LIKE '% et %' THEN 'fr'
                        ELSE 'und' END AS predicted, count(*) AS n
      FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "q22_fingerprint" -> """
      SELECT source, count(*) AS n_docs,
             count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_fp
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q23_shingle_pairs" -> """
      WITH sh AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest([array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]) AS sh
          FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents)
          WHERE len(ws) >= 3)),
      rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1) WHERE df <= 20),
      f AS (SELECT doc_id, sh.sh FROM sh JOIN rare USING (sh))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      FROM f a JOIN f b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 10 ORDER BY 1, 2""",
    // verify stage of MinHash+LSH: exact shingle-set Jaccard + threshold
    // over the dumped candidate pairs (banding recall pinned in TextOpsSpec)
    "q24_minhash_lsh" -> s"""
      WITH $q24ScoredCtes
      SELECT doc_a, doc_b, round(inter / uni, 4) AS jaccard FROM scored
      WHERE inter / uni >= 0.4 ORDER BY doc_a, doc_b""",
    // pair->cluster: transitive closure over the SAME verified pair set;
    // cluster = min reachable doc id (the canonical member)
    "q31_dup_clusters" -> s"""
      WITH RECURSIVE $q24ScoredCtes,
      verified AS (SELECT doc_a, doc_b FROM scored WHERE inter / uni >= 0.4),
      und AS (SELECT doc_a AS u, doc_b AS v FROM verified
              UNION SELECT doc_b, doc_a FROM verified),
      reach AS (
        SELECT u AS a, u AS b FROM (SELECT DISTINCT u FROM und)
        UNION
        SELECT r.a, e.v AS b FROM reach r JOIN und e ON e.u = r.b)
      SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY 1 ORDER BY 1"""
  )

  /** shared oracle CTEs: per-doc distinct shingle sets + exact Jaccard
    * scores of the dumped q24 candidate pairs
    */
  private def q24ScoredCtes: String = s"""
      shs AS (
        SELECT doc_id, list(DISTINCT sh) AS sset FROM (
          SELECT doc_id, unnest([array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]) AS sh
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents)
          WHERE len(ws) >= 3)
        GROUP BY doc_id),
      cand AS (SELECT doc_a, doc_b FROM read_parquet('${CdcQueries.FixtureRoot}/q24_cands_${Fixtures.oracleSfTag}/*.parquet')),
      scored AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(a.sset, b.sset))::DOUBLE AS inter,
               len(list_distinct(a.sset || b.sset))::DOUBLE AS uni
        FROM cand c JOIN shs a ON a.doc_id = c.doc_a JOIN shs b ON b.doc_id = c.doc_b)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_sha_docs" -> q17ShaDocs _, "q18_dedup_exact" -> q18DedupExact _,
    "q19_token_stats" -> q19TokenStats _, "q20_quality" -> q20Quality _,
    "q21_langid" -> q21LangId _, "q22_fingerprint" -> q22Fingerprint _,
    "q23_shingle_pairs" -> q23ShinglePairs _,
    "q24_minhash_lsh" -> ((s: SparkSession, d: String) => q24MinhashLsh(s, d)),
    "q25_simhash" -> q25Simhash _,
    "q31_dup_clusters" -> q31DupClusters _,
    "q52_substring_dedup" -> q52SubstringDedup _
  )
}
