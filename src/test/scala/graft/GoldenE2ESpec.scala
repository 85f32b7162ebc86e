package graft

import graft.queries.CdcQueries

/** Suite 7 (SURVEY.md §5.2): golden end-to-end. The sm fixture (seed 42,
  * 50k events, 1000 keys, hot repo) through the full pipeline must produce
  * EXACTLY these publish-layer aggregates — values independently computed
  * with DuckDB's own window/CASE/sha functions over the same WAL parquet
  * (the reference's category-distribution logs formalised,
  * process_layers.py:207-209). Any engine change that shifts a single row
  * fails here.
  */
class GoldenE2ESpec extends SparkSpec {

  val goldenLangCounts = Map(
    "go" -> 101L, "java" -> 82L, "javascript" -> 99L, "markdown" -> 95L,
    "other" -> 97L, "python" -> 92L, "rust" -> 73L, "scala" -> 82L,
    "sql" -> 91L, "yaml" -> 83L)
  val goldenKeys = 1000L
  val goldenTombstones = 105L

  test("sm fixture end-to-end matches the DuckDB-derived golden aggregates") {
    val got = CdcQueries.cdcLangCounts(spark, "unused")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == goldenLangCounts)
    assert(got.values.sum == goldenKeys - goldenTombstones)

    val lake = CdcQueries.smLake(spark)
    val snap = lake.currentSnapshot().get
    assert(snap.totalRows == goldenKeys, "1000 keys stored (incl. tombstones)")
    assert(snap.hwm == 50000L)
    val tombs = lake.readResolved().where(org.apache.spark.sql.functions.col("deleted")).count()
    assert(tombs == goldenTombstones)
  }
}
