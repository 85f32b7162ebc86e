package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}

/** The engine's key-bucket transform as a DSv2 catalog function —
  * `bucket(n, repo, path) = pmod(xxhash64(repo, path), n)`, bit-identical
  * to the layout hash every write path uses (`LakeTable.bucketCol`).
  *
  * This is what makes STORAGE-PARTITIONED JOINS (Spark's SPJ, the DSv2
  * successor to bucketed-table joins) work end to end: `GraftScan` reports
  * `KeyGroupedPartitioning(bucket(n, repo, path))`, Spark resolves the
  * `bucket` name through the table's catalog (`GraftCatalog` implements
  * `FunctionCatalog`), and two graft tables with the SAME bucket count
  * joined on the full key plan ZERO shuffles — each task joins one
  * bucket's files from both sides. At 100 TB that deletes the dominant
  * cost of snapshot-vs-snapshot joins (both Exchanges AND both sorts).
  *
  * The bound function is also a real `ScalarFunction`: `produceResult`
  * evaluates the hash row-at-a-time, so Spark can shuffle a NON-graft
  * side into the graft layout (`spark.sql.sources.v2.bucketing.shuffle.
  * enabled`) instead of shuffling both sides.
  *
  * `canonicalName` is the identity Spark compares across the two join
  * sides — it names the hash's semantics (seed-42 xxhash64 chain over
  * repo then path), which is fixed for the table format's lifetime.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(nBuckets, repo, path): graft key-bucket id = pmod(xxhash64(repo, path), nBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    val ts = inputType.fields.map(_.dataType)
    require(ts.length == 3 && ts(0) == IntegerType && ts(1) == StringType && ts(2) == StringType,
      s"graft bucket(n, repo, path) expects (int, string, string), got ${ts.mkString("(", ", ", ")")}")
    Bound
  }

  object Bound extends ScalarFunction[Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(xxhash64-seed42, repo, path)"
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType, StringType)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false

    /** row = (nBuckets, repo, path); the fold order and 42L seed mirror
      * `functions.xxhash64(repo, path)` exactly
      */
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      var h = 42L
      h = XxHash64Function.hash(input.getUTF8String(1), StringType, h)
      h = XxHash64Function.hash(input.getUTF8String(2), StringType, h)
      (((h % n) + n) % n).toInt
    }
  }
}
