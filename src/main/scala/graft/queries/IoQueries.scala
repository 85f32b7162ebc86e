package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import RelationalQueries.{cents, T}

/** Interchange-format IO battery (SURVEY.md §2.1 S4, §2.2 K2/K3): CSV
  * ingestion with a declared schema (the reference's CSV fetch + schema
  * repair, population_pipeline_stuttgart.py:27-68) and the publish-layer
  * export sink with its manifest (data_loader.py:253-261). Both queries
  * round-trip through the text format and are oracle-checked by DuckDB
  * reading the very same files.
  */
object IoQueries {

  /** S4: semicolon-separated CSV with header, read back under a DECLARED
    * schema (never inferred — schema repair is explicit typing), then
    * aggregated. The fixture is the events table re-encoded to CSV.
    */
  def q32CsvIngest(s: SparkSession, dir: String): DataFrame = {
    val csvDir = s"${CdcQueries.FixtureRoot}/events_csv_${Fixtures.sfTag(dir)}"
    // fixture, not the measured operation: idempotent via _SUCCESS so the
    // timed query is the declared-schema READ, never the re-encode
    val fsx = new graft.table.Fs(s.sessionState.newHadoopConf())
    if (!fsx.exists(s"$csvDir/_SUCCESS"))
      T(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          unix_timestamp(col("ts")).as("ts_epoch"))
        .write.mode("overwrite").option("sep", ";").option("header", "true").csv(csvDir)
    s.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts_epoch BIGINT")
      .option("sep", ";").option("header", "true")
      .csv(csvDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"),
        max("ts_epoch").as("max_ts"))
      .orderBy("event_type")
  }

  /** K2/K3: manifest-stamped CSV export of a publish-layer frame, read back
    * under the declared schema — the oracle is the SOURCE frame's own SQL,
    * so a lossy or incomplete export fails the gate.
    */
  def q33Export(s: SparkSession, dir: String): DataFrame = {
    val out = s"${CdcQueries.FixtureRoot}/export_repo_summary_${Fixtures.sfTag(dir)}"
    graft.publish.Export.exportDir(CdcQueries.pubRepoSummary(s, dir), out, "csv")
    s.read
      .schema("repo STRING, n_files BIGINT, total_bytes BIGINT, max_lsn BIGINT")
      .option("header", "true").csv(out)
      .orderBy("repo")
  }

  /** §2.9 json column functions: serialise per-row structs with to_json,
    * parse back with from_json under a declared schema, aggregate the
    * parsed fields. The round-trip is the point — a formatting or parsing
    * defect breaks the oracle, which aggregates the source table directly.
    */
  def q37JsonCols(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val parsedSchema = StructType.fromDDL("doc_id BIGINT, lang STRING, n_toks BIGINT")
    T(s, dir, "documents")
      .select(to_json(struct(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))).as("js"))
      .select(from_json(col("js"), parsedSchema).as("r"))
      .select("r.*")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_toks").as("total_toks"), max("doc_id").as("max_doc"))
      .orderBy("lang")
  }

  /** S3 format auto-detect factory (the reference's suffix dispatch,
    * data_loader.py:294-326): the SAME aggregation fed once by a
    * suffix-dispatched parquet read and once by a directory-dispatched JSON
    * read of a re-encoded fixture — a wrong dispatch or a lossy re-encode
    * breaks the oracle, which aggregates both artifact sets itself.
    */
  def q43Autoload(s: SparkSession, dir: String): DataFrame = {
    import graft.source.AutoLoader
    val jsonDir = s"${CdcQueries.FixtureRoot}/events_json_${Fixtures.sfTag(dir)}"
    val fsx = new graft.table.Fs(s.sessionState.newHadoopConf())
    if (!fsx.exists(s"$jsonDir/_SUCCESS"))
      T(s, dir, "events").select(col("event_id"), col("event_type"), col("value"))
        .write.mode("overwrite").json(jsonDir)
    val parquet = AutoLoader.load(s, s"$dir/events.parquet") // file-suffix dispatch
    val json = AutoLoader.load(s, jsonDir,                   // dir-listing dispatch
      Some(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, event_type STRING, value DOUBLE")))
    parquet.groupBy("event_type").agg(count(lit(1)).as("n_parquet"))
      .join(json.groupBy("event_type").agg(count(lit(1)).as("n_json"),
        sum(cents(col("value"))).as("json_cents")), Seq("event_type"))
      .orderBy("event_type")
  }

  private def csvSrc =
    s"""read_csv('${CdcQueries.FixtureRoot}/events_csv_${Fixtures.oracleSfTag}/*.csv', delim=';', header=true,
       |  columns={'event_id':'BIGINT','user_id':'BIGINT','event_type':'VARCHAR','value':'DOUBLE','ts_epoch':'BIGINT'})""".stripMargin

  val oracles: Map[String, String] = Map(
    "q32_csv_ingest" -> s"""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
             max(ts_epoch) AS max_ts
      FROM $csvSrc GROUP BY 1 ORDER BY 1""",
    "q33_export" -> CdcQueries.oracles("pub_repo_summary"),
    "q37_json_cols" -> """
      SELECT lang, count(*) AS n,
             CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_toks,
             max(doc_id) AS max_doc
      FROM documents GROUP BY 1 ORDER BY 1""",
    "q43_autoload" -> s"""
      SELECT p.event_type, p.n_parquet, j.n_json, j.json_cents FROM
        (SELECT event_type, count(*) AS n_parquet FROM events GROUP BY 1) p
      JOIN
        (SELECT event_type, count(*) AS n_json,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS json_cents
         FROM read_json('${CdcQueries.FixtureRoot}/events_json_${Fixtures.oracleSfTag}/*.json',
                        columns={'event_id':'BIGINT','event_type':'VARCHAR','value':'DOUBLE'})
         GROUP BY 1) j
      USING (event_type) ORDER BY 1"""
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_csv_ingest" -> q32CsvIngest _,
    "q33_export" -> q33Export _,
    "q37_json_cols" -> q37JsonCols _,
    "q43_autoload" -> q43Autoload _
  )
}
