package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.table.Fs

/** Suffix-dispatched source factory (SURVEY.md §2.1 S3 tail — the
  * reference's loader dispatches on file suffix, data_loader.py:294-326):
  * one entry point that routes a path to the right reader. A bare file
  * dispatches on its own extension; a directory (the normal Spark output
  * shape) dispatches on the extension of its first data file, discovered
  * through the Hadoop FS listing (object-store capable, ignores `_SUCCESS`
  * / checksum droppings).
  *
  * Schema is optional: parquet is self-describing; CSV/JSON callers pass a
  * DECLARED schema (the engine's explicit-typing stance — inference is for
  * exploration, not pipelines).
  */
object AutoLoader {

  private val Known = Set("parquet", "json", "csv")

  def load(spark: SparkSession, path: String, schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val fmt = detect(spark, path)
    val r0 = spark.read.options(options)
    val r = schema.fold(r0)(r0.schema)
    fmt match {
      case "parquet" => r.parquet(path)
      case "json"    => r.json(path)
      case "csv"     => r.option("header", options.getOrElse("header", "true")).csv(path)
      case other     => throw new IllegalArgumentException(
        s"auto-load: no reader for extension '$other' at $path (known: ${Known.mkString(", ")})")
    }
  }

  /** format of `path`: its own extension, else its first data file's */
  def detect(spark: SparkSession, path: String): String = {
    def ext(name: String): Option[String] = {
      val i = name.lastIndexOf('.')
      if (i > 0) Some(name.substring(i + 1).toLowerCase) else None
    }
    ext(path).filter(Known) match {
      case Some(e) => e
      case None =>
        val fs = new Fs(spark.sessionState.newHadoopConf())
        fs.listFiles(path, n => !n.startsWith("_") && !n.startsWith(".") && ext(n).exists(Known))
          .headOption
          .flatMap(p => ext(new org.apache.hadoop.fs.Path(p).getName))
          .getOrElse(throw new IllegalArgumentException(
            s"auto-load: cannot infer a format for $path (no recognisable data files)"))
    }
  }
}
