package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic seeded WAL generator (FIXTURES.md §2, §4).
  *
  * Built entirely from Catalyst expressions over `spark.range(n)` — no
  * driver-side loops, no RNG objects — so the same code that makes a 10k-row
  * test fixture makes a multi-billion-row bench input on a cluster, fully
  * parallel and whole-stage-codegen'd. Every column is a pure function of
  * (seed, id), so any two runs (any partitioning, any parallelism) produce
  * the identical multiset of events — the determinism the reference gets
  * from re-running the numbered pipeline on fixed inputs
  * (reference: stuttgart_comprehensive_script.py:48-74).
  *
  * Skew profile (FIXTURES.md §4): `org-0/hot` receives `hotShare` of all
  * events — exercises the salted repartitioner; the reference has no skew
  * handling at all (SURVEY.md §4 "Skew handling: absent").
  */
final case class GenConfig(
    seed: Long = 42L,
    events: Long = 10000L,
    repos: Int = 50,
    filesPerRepo: Int = 40,
    hotShare: Double = 0.5,   // fraction of events hitting the single hot repo
    epochSeconds: Long = 1767225600L, // 2026-01-01T00:00:00Z, fixed (no wall clock)
    maxContentReps: Int = 64  // content = 64-char block × 1..maxContentReps
)

object ChangeLogGen {

  private val exts = Seq(".scala", ".py", ".sql", ".md", ".yaml", ".java", ".rs", ".go", ".js", ".txt")

  /** u in [0,1) derived from (seed, tag, id) — a cheap splittable PRNG. */
  private def u(cfg: GenConfig, tag: String) =
    pmod(xxhash64(lit(cfg.seed), lit(tag), col("id")), lit(1000000L)).cast("double") / 1000000.0

  private def h(cfg: GenConfig, tag: String) = xxhash64(lit(cfg.seed), lit(tag), col("id"))

  /** The change log as a DataFrame with Schemas.changeEvent columns
    * (+ none extra). Ordered by lsn == id+1.
    */
  def changeLog(spark: SparkSession, cfg: GenConfig): DataFrame = {
    val df = spark.range(cfg.events)

    val isHot = u(cfg, "hot") < cfg.hotShare
    val repoIdx = when(isHot, lit(0))
      .otherwise(lit(1) + pmod(h(cfg, "repo"), lit((cfg.repos - 1).toLong)).cast("int"))
    val fileIdx = pmod(h(cfg, "file"), lit(cfg.filesPerRepo.toLong)).cast("int")
    val extIdx = pmod(h(cfg, "ext"), lit(exts.size.toLong)).cast("int")
    // ext is a function of (repo,file) key so a key's path is stable:
    val keyExtIdx = pmod(xxhash64(lit(cfg.seed), lit("kext"), repoIdx, fileIdx), lit(exts.size.toLong)).cast("int")

    val opU = u(cfg, "op")
    val op = when(opU < 0.6, "I").when(opU < 0.9, "U").otherwise("D")

    val repoCol = concat(lit("org-"), lpad(repoIdx.cast("string"), 4, "0"), lit("/proj-"),
      pmod(xxhash64(lit(cfg.seed), lit("proj"), repoIdx), lit(10L)).cast("string"))
    val dirIdx = pmod(xxhash64(lit(cfg.seed), lit("dir"), repoIdx, fileIdx), lit(8L)).cast("int")
    val pathCol = concat(lit("src/d"), dirIdx.cast("string"), lit("/File"),
      fileIdx.cast("string"), element_at(array(exts.map(lit): _*), keyExtIdx + 1))

    val lsn = col("id") + 1L
    val commitCol = substring(sha2(concat_ws("|", repoCol, pathCol, lsn.cast("string")), 256), 1, 40)

    // Deterministic pseudo-source text, 64..4096 chars (FIXTURES.md §1):
    // one 64-char sha block repeated 1..64 times. Deletes carry null content.
    val reps = (lit(1) + pmod(h(cfg, "len"), lit(cfg.maxContentReps.toLong))).cast("int")
    val base = sha2(concat(commitCol, lit("#content")), 256)
    val contentCol = when(op === "D", lit(null).cast("string"))
      .otherwise(repeat(base, reps))

    df.select(
      lsn.as("lsn"),
      timestamp_seconds(lit(cfg.epochSeconds) + col("id")).as("ts"),
      op.as("op"),
      repoCol.as("repo"),
      pathCol.as("path"),
      commitCol.as("commit"),
      contentCol.as("content")
    )
  }

  /** Write the WAL as ordered parquet segment files (FIXTURES.md §2):
    * range-partitioned by lsn so segment k holds a contiguous lsn range —
    * the file-source offset order then matches log order. Idempotent: skips
    * if `dir` already holds a _SUCCESS marker.
    */
  def writeWal(spark: SparkSession, cfg: GenConfig, dir: String, segments: Int): Unit = {
    val fs = new graft.table.Fs(spark.sessionState.newHadoopConf())
    if (fs.exists(s"$dir/_SUCCESS")) return
    changeLog(spark, cfg)
      .repartitionByRange(segments, col("lsn"))
      .sortWithinPartitions("lsn")
      .write.mode("overwrite").parquet(dir)
    // Spark's file stream source orders new files by modification time
    // (path only tie-breaks); the parallel write finishes segments in
    // arbitrary order, which would make micro-batches interleave lsn
    // ranges. Re-stamp mtimes in segment order so the tail delivers the
    // log IN ORDER — part-NNNNN is the NNNNN-th lsn range because
    // repartitionByRange assigns ranges by partition index. (The merge is
    // order-robust regardless — tombstones + the max-LSN guard — this
    // keeps the delivery contract and the staleRows metric meaningful.)
    val files = fs.listFiles(dir,
      n => n.startsWith("part-")).sorted
    val base = System.currentTimeMillis() - files.length * 2000L
    files.zipWithIndex.foreach { case (f, i) => fs.setTimes(f, base + i * 2000L) }
  }
}
