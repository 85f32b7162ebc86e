package graft.queries

import org.apache.spark.sql.DataFrame

/** Candidate-dump pattern for oracling hash-dependent pipelines: the
  * candidate GENERATION stage (MinHash bands, LSH buckets — functions of
  * Spark's xxhash64, not expressible in DuckDB) dumps its ID pairs to a
  * fixture path; the exact VERIFICATION stage (Jaccard/cosine + threshold /
  * top-k) is then computed from the re-read fixture by BOTH engines, so the
  * driver's DuckDB oracle checks every output row end-to-end. Recall of the
  * generation stage itself is pinned separately in ScalaTest
  * (TextOpsSpec/VectorOpsSpec vs brute force).
  */
object Fixtures {
  /** roots for generated fixtures / scratch lakes — any Hadoop-FS-pathable
    * URI (all writes go through Spark writers / graft.table.Fs, never
    * java.io); local /tmp is the sandbox default, a cluster deployment
    * points these at its scratch bucket. The oracle SQL interpolates the
    * SAME value at dump time, so Spark and DuckDB always read one fixture.
    */
  val FixtureRoot: String = sys.env.getOrElse("GRAFT_FIXTURE_ROOT", "/tmp/graft_fixtures")
  val LakeRoot: String = sys.env.getOrElse("GRAFT_LAKE_ROOT", "/tmp/graft_lakes")

  /** sf tag the ORACLE SQL's fixture paths interpolate. Defaults to the
    * driver's gated scale (sf0.01); graft.Verify sets the property from
    * its sfDir BEFORE the oracle strings initialize, so the local replica
    * is scale-correct at any sf. (Read at object-init of the query
    * modules — set the property before touching SparkEntry.)
    */
  def oracleSfTag: String = sys.props.getOrElse("graft.sf.tag", "sf0.01")

  /** write-then-reread so the verify stage (both engines) sees the exact
    * same materialised candidate set, not a recomputation
    */
  def dump(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  def sfTag(dir: String): String = dir.split("/").filter(_.nonEmpty).last
}
