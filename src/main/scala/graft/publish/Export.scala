package graft.publish

import org.apache.spark.sql.DataFrame

import graft.table.Fs

/** Publish-layer export sink (SURVEY.md §2.2 K2/K3) — the reference's
  * GeoJSON/CSV artifact exports with run provenance
  * (spatial_analysis_core/data_loader.py:253-261,
  * population_pipeline_stuttgart.py:136): write the frame in a
  * text-interchange format plus a manifest stamping what was written
  * (row count, schema, format, files), so a consumer can validate the
  * artifact without re-reading all of it. All metadata IO via the Hadoop
  * FileSystem API, same as the table layer.
  */
object Export {

  final case class Manifest(format: String, rows: Long, schemaDdl: String, files: Seq[String])

  /** export `df` to `outDir` as csv|json, then stamp `_export_manifest.json` */
  def exportDir(df: DataFrame, outDir: String, format: String = "csv",
                options: Map[String, String] = Map.empty): Manifest = {
    require(format == "csv" || format == "json", s"unsupported export format: $format")
    // certified row count via observe() ON THE WRITE ITSELF: the metric is
    // collected from the rows that actually flowed into the files — one
    // scan of the input, no second read of the artifact (which, for CSV,
    // also miscounted rows containing newlines unless multiLine was set).
    // Batch-only: Observation.get would never complete inside a streaming
    // foreachBatch (inner executions fire no listener events).
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
    val writer = observed.write.mode("overwrite").options(options)
    format match {
      case "csv"  => writer.option("header", "true").csv(outDir)
      case "json" => writer.json(outDir)
    }
    val rows = obs.get("rows").asInstanceOf[Long]
    val fs = new Fs(df.sparkSession.sessionState.newHadoopConf())
    val files = fs.listFiles(outDir, n => n.startsWith("part-"))
      .map(p => new org.apache.hadoop.fs.Path(p).getName)
    val m = Manifest(format, rows, df.schema.toDDL, files)
    fs.atomicWrite(s"$outDir/_export_manifest.json", manifestJson(m))
    m
  }

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def manifestJson(m: Manifest): String =
    s"""{"format":${q(m.format)},"rows":${m.rows},"schemaDdl":${q(m.schemaDdl)},"files":${m.files.map(q).mkString("[", ",", "]")}}"""

  def readManifest(spark: org.apache.spark.sql.SparkSession, outDir: String): Manifest = {
    val fs = new Fs(spark.sessionState.newHadoopConf())
    val v = graft.table.JsonMini.parse(fs.readString(s"$outDir/_export_manifest.json"))
      .asInstanceOf[Map[String, Any]]
    Manifest(v("format").asInstanceOf[String], graft.table.SnapshotIO.asLong(v("rows")),
      v("schemaDdl").asInstanceOf[String],
      v("files").asInstanceOf[Seq[Any]].map(_.asInstanceOf[String]))
  }
}
