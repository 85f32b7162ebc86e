package graft.model

import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, functions => F}

/** Core data model of the CDC engine (SURVEY.md §1.4).
  *
  * Base lake table shape is mandated by BASELINE.json `input_hint`:
  * `repos(repo, path, commit, lang, content)`; the change-event envelope
  * adds the WAL bookkeeping columns. The reference's analogue of a change
  * event is one staged OSM feature row plus its run provenance
  * (reference: spatial_analysis_core/data_loader.py:60-126,
  * cities/stuttgart/spatial_analysis/stuttgart_comprehensive_script.py:48-74).
  */
final case class ChangeEvent(
    lsn: Long,              // strictly monotonic global sequence (ordering + dedup key)
    ts: java.sql.Timestamp, // event time; watermark column
    op: String,             // I | U | D
    repo: String,
    path: String,
    commit: String,
    content: String         // null for deletes
)

/** One live row of the `repos` lake table (clean layer adds lang + sha). */
final case class RepoRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    contentSha: String,
    lsn: Long,
    deleted: Boolean
)

object Schemas {
  /** WAL / bronze schema. `branch` is NOT here — it arrives mid-stream in
    * the schema-evolution fixture (FIXTURES.md §5) and must be handled
    * additively (nullable, old rows null-backfilled).
    */
  val changeEvent: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("content", StringType, nullable = true)
  ))

  /** Clean-layer table schema (before any evolution). Tombstones are kept
    * (`deleted = true`) so merge is order/replay robust; readers filter.
    */
  val repoRow: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("contentSha", StringType, nullable = true),
    StructField("lsn", LongType, nullable = false),
    StructField("deleted", BooleanType, nullable = false)
  ))
}

/** Rule-driven categorisation — the engine's analogue of the reference's
  * YAML tag→category tables applied per layer
  * (reference: cities/stuttgart/spatial_analysis/scripts/process_layers.py:302-321,
  * docs/data_layers.md:272-308). Compiled to a Catalyst `when/otherwise`
  * chain (codegen'd — no UDF), with the reference's `"other"` fallback
  * (process_layers.py:309).
  */
object LangRules {
  /** rule-table version (the reference's rules files carry `version:`
    * metadata, docs/data_layers.md:276-296); recorded per table in the
    * catalog properties so a rules change is visible in lineage.
    */
  val version = "1"

  /** suffix → language; ordered (first match wins, like the rule tables). */
  val rules: Seq[(String, String)] = Seq(
    ".scala" -> "scala",
    ".py"    -> "python",
    ".sql"   -> "sql",
    ".md"    -> "markdown",
    ".yaml"  -> "yaml",
    ".yml"   -> "yaml",
    ".java"  -> "java",
    ".rs"    -> "rust",
    ".go"    -> "go",
    ".js"    -> "javascript"
  )
  val fallback = "other"

  /** Catalyst expression: lang from a path column. */
  def langFor(path: Column): Column =
    rules.foldLeft(Option.empty[Column]) { case (acc, (suffix, lang)) =>
      val cond = F.endswith(path, F.lit(suffix))
      Some(acc.fold(F.when(cond, lang))(_.when(cond, lang)))
    }.get.otherwise(fallback)

  /** Same rule table as ANSI SQL CASE, for DuckDB oracles. */
  def langSqlCase(pathExpr: String): String = {
    val ws = rules.map { case (s, l) => s"WHEN $pathExpr LIKE '%$s' THEN '$l'" }
    s"CASE ${ws.mkString(" ")} ELSE '$fallback' END"
  }
}
