package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.gen.{ChangeLogGen, GenConfig}
import graft.queries._
import graft.table.{ApplyMode, LakeTable}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` covers SURVEY.md §2 operator-by-operator (scans, joins J1-J5,
  * aggs A1-A13, windows W1-W5, sorts/limits, set ops, scalar function
  * families, streaming-shaped CDC apply) plus the training-data battery
  * (exact/MinHash/SimHash/embedding dedup, ANN, text analysis, multimodal
  * stub). Oracle-backed queries are listed in `oracleSql`; hash-dependent
  * ones (MinHash/SimHash/LSH) are verified in ScalaTest suites instead.
  */
object SparkEntry {

  /** Flagship: full CDC pipeline at xs scale — WAL gen → 3-batch merge →
    * live per-lang file counts off the snapshot. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = GenConfig(seed = 42L, events = 10000L, repos = 20, filesPerRepo = 30)
    val dir = s"${CdcQueries.LakeRoot}/entry_xs"
    CdcQueries.deleteRec(dir)
    val t = new LakeTable(spark, dir, 8, ApplyMode.CopyOnWrite)
    val wal = ChangeLogGen.changeLog(spark, cfg)
    // INTENTIONAL abuse: pmod(lsn, 3) batching delivers interleaved,
    // non-contiguous LSN ranges — a worst-case ordering the merge must
    // absorb (tombstones + max-LSN guard make it order-robust); real
    // streams deliver contiguous ranges
    (0 until 3).foreach { i =>
      t.merge(wal.where(pmod(col("lsn"), lit(3)) === i), "entry", i.toLong)
    }
    t.read().groupBy("lang").agg(count(lit(1)).as("n_files")).orderBy("lang")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ MultimodalQueries.queries ++ IoQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for hash-dependent ops (MinHash,
    * SimHash, LSH buckets, ledger audit) → rows-only check; those are
    * covered by ScalaTest oracles instead.
    */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ IoQueries.oracles ++ MultimodalQueries.oracles
}
