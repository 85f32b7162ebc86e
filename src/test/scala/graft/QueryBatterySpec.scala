package graft

/** Smoke for the full driver contract: entry() and every queries() entry
  * runs at sf0.001 and returns a sane frame (rows>0 unless legitimately
  * empty). The value-level check is the DuckDB oracle gate (driver-run) —
  * replicated locally by tools/compare_oracle.py.
  */
class QueryBatterySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle-backed query has an oracleSql entry with matching name") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  // queries that can legitimately return zero rows at xs scale
  private val mayBeEmpty = Set("q24_minhash_lsh", "q28_embedding_dup", "q23_shingle_pairs", "q4_anti")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
