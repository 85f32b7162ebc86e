package graft

import org.apache.spark.sql.functions._

import graft.functions.native
import graft.queries.{TextQueries, VectorQueries}

/** The native codegen expressions must be bit-identical to the
  * higher-order-function reference implementations on real data, and must
  * survive whole-stage codegen (no fallback).
  */
class NativeExpressionsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("native simhash64 == HOF simhash64 on the documents corpus") {
    native.register(spark)
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        TextQueries.simhash64(TextQueries.tokens(col("text"))).as("hof"),
        native.simhash64(TextQueries.tokens(col("text"))).as("nat"))
    assert(df.where(col("hof") =!= col("nat")).count() == 0)
    assert(df.count() > 0)
  }

  test("native cosine == HOF cosine on the embeddings corpus (exact)") {
    native.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.limit(30).select(col("vec_id").as("ida"), col("v").as("va"))
    val b = e.limit(30).select(col("vec_id").as("idb"), col("v").as("vb"))
    val df = a.crossJoin(b)
      .select(VectorQueries.cosine(col("va"), col("vb")).as("hof"),
        native.cosine(col("va"), col("vb")).as("nat"))
    assert(df.where(col("hof") =!= col("nat")).count() == 0)
  }

  test("cosine malformed inputs -> null in BOTH forms (mismatch, zero, null elem)") {
    native.register(spark)
    import spark.implicits._
    val df = Seq(
      ("mismatch", Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),
      ("zero_left", Seq(0.0, 0.0), Seq(1.0, 2.0)),
      ("zero_both", Seq(0.0, 0.0), Seq(0.0, 0.0)),
      ("ok", Seq(1.0, 0.0), Seq(1.0, 0.0))
    ).toDF("case", "a", "b")
      .select(col("case"),
        VectorQueries.cosine(col("a"), col("b")).as("hof"),
        native.cosine(col("a"), col("b")).as("nat"))
    val rows = df.collect().map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(rows("mismatch") == (true, true), "length mismatch must be null, not prefix-cosine")
    assert(rows("zero_left") == (true, true), "zero vector must be null, not NaN")
    assert(rows("zero_both") == (true, true))
    assert(rows("ok") == (false, false))
    // null element → null (both forms)
    val ne = spark.sql("SELECT cosine_sim(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) AS c")
    assert(ne.collect().head.isNullAt(0))
  }

  test("wrong arity is a meaningful error, not IndexOutOfBounds") {
    native.register(spark)
    val e1 = intercept[Exception](spark.sql("SELECT cosine_sim(array(1.0d))").collect())
    assert(e1.getMessage.contains("cosine_sim requires exactly 2 arguments"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql("SELECT simhash64()").collect())
    assert(e2.getMessage.contains("simhash64 requires exactly 1 argument"), e2.getMessage)
  }

  test("native expressions run inside WholeStageCodegen") {
    native.register(spark)
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(native.simhash64(TextQueries.tokens(col("text"))).as("h"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan.take(500))
    // and it must actually evaluate under codegen without falling back
    assert(df.agg(countDistinct("h")).collect().head.getLong(0) > 0)
  }

  test("SQL surface: simhash64/cosine_sim callable from spark.sql") {
    native.register(spark)
    spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("docs_ne")
    val n = spark.sql(
      "SELECT simhash64(split(trim(text), '\\\\s+')) AS h FROM docs_ne").count()
    assert(n > 0)
  }
}
