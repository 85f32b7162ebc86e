package graft

import org.apache.spark.sql.functions._

import graft.publish.Export

/** K2/K3 export sink: artifact + manifest must certify exactly what was
  * written, in both csv and json, and round-trip losslessly.
  */
class ExportSpec extends SparkSpec {

  test("csv export: manifest rows/files/schema match the artifact") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.5), ("b", 2L, -0.25), ("c", 3L, 100.0)).toDF("k", "n", "v")
    val out = tmpDir("exp_csv")
    val m = Export.exportDir(df, out, "csv")
    assert(m.rows == 3 && m.format == "csv" && m.files.nonEmpty)
    assert(m.schemaDdl == df.schema.toDDL)
    val back = spark.read.schema("k STRING, n BIGINT, v DOUBLE").option("header", "true").csv(out)
    assert(collectSorted(back) == collectSorted(df))
    // manifest readable from disk and identical
    assert(Export.readManifest(spark, out) == m)
  }

  test("json export round-trips including nulls") {
    import spark.implicits._
    val df = Seq(("x", Some(1L)), ("y", None)).toDF("k", "n")
    val out = tmpDir("exp_json")
    val m = Export.exportDir(df, out, "json")
    assert(m.rows == 2)
    val back = spark.read.schema("k STRING, n BIGINT").json(out)
    assert(collectSorted(back) == collectSorted(df))
  }

  test("manifest row count is exact for values containing newlines (one input scan)") {
    import spark.implicits._
    // the old verify-by-re-read miscounted: the CSV writer quotes embedded
    // newlines, but a non-multiLine read-back splits them into extra rows.
    // observe()-based counting certifies the rows that flowed into the files.
    val df = Seq(("a", "line1\nline2"), ("b", "plain"), ("c", "x\ny\nz")).toDF("k", "txt")
    val out = tmpDir("exp_nl")
    val m = Export.exportDir(df, out, "csv")
    assert(m.rows == 3, s"manifest must count logical rows, got ${m.rows}")
    val back = spark.read.schema("k STRING, txt STRING")
      .option("header", "true").option("multiLine", "true").csv(out)
    assert(collectSorted(back) == collectSorted(df))
  }

  test("unsupported format is rejected") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Export.exportDir(Seq(1).toDF("a"), tmpDir("exp_bad"), "parquetish")
    }
  }

  test("export works against a file: URI out dir (Hadoop FS path)") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "n")
    val out = "file:" + tmpDir("exp_uri")
    val m = Export.exportDir(df, out, "csv")
    assert(m.rows == 1 && Export.readManifest(spark, out).rows == 1)
  }
}
