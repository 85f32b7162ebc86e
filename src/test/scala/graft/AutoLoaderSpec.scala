package graft

import org.apache.spark.sql.types.StructType

import graft.source.AutoLoader

/** S3 suffix-dispatch factory: file-extension and directory-listing
  * detection, correct reader per format, useful failures otherwise.
  */
class AutoLoaderSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq((1L, "a", 1.5), (2L, "b", -2.0)).toDF("id", "k", "v")
  private val ddl = "id BIGINT, k STRING, v DOUBLE"

  test("dispatches parquet, json and csv directories by their data files") {
    val roots = Seq("parquet", "json", "csv").map { fmt =>
      val out = tmpDir(s"auto_$fmt")
      val w = fixture.write.mode("overwrite")
      fmt match {
        case "parquet" => w.parquet(out)
        case "json"    => w.json(out)
        case "csv"     => w.option("header", "true").csv(out)
      }
      fmt -> out
    }
    roots.foreach { case (fmt, out) =>
      assert(AutoLoader.detect(spark, out) == fmt, s"detect($out)")
      val back = AutoLoader.load(spark, out, Some(StructType.fromDDL(ddl)))
      assert(collectSorted(back) == collectSorted(fixture), s"round-trip via $fmt")
    }
  }

  test("a bare file path dispatches on its own extension") {
    assert(AutoLoader.detect(spark, "/root/testdata/sf0.001/events.parquet") == "parquet")
    assert(AutoLoader.load(spark, "/root/testdata/sf0.001/events.parquet").count() > 0)
  }

  test("unknown formats fail with a useful error") {
    val e = intercept[IllegalArgumentException] {
      AutoLoader.load(spark, tmpDir("auto_empty"))
    }
    assert(e.getMessage.contains("cannot infer"), e.getMessage)
  }
}
