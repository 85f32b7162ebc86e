package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with doGenCode) for the two hottest
  * non-relational kernels. The higher-order-function forms
  * (TextQueries.simhash64, VectorQueries.cosine) evaluate their lambdas
  * interpreted, one virtual call per element; these compile to a tight
  * Java loop inside whole-stage codegen. Semantics are bit-identical to
  * the HOF forms (asserted in NativeExpressionsSpec), so either can back
  * the public API.
  *
  * Exposed through the function registry (version-stable way to lift an
  * Expression into a Column) — call `native.register(spark)` once per
  * session, then `native.simhash64(col)` / SQL `simhash64(tokens)`.
  */
object native {
  @volatile private var registered = Set.empty[String]

  /** builder-side arity validation: a wrong-arity SQL call gets a meaningful
    * analysis-time error instead of an IndexOutOfBoundsException.
    */
  private[functions] def requireArity(name: String, signature: String,
                                      exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument${if (n == 1) "" else "s"}: $signature (got ${exprs.length})")

  private[functions] def buildSimhash(exprs: Seq[Expression]): Expression = {
    requireArity("simhash64", "simhash64(tokens: array<string>)", exprs, 1)
    SimHash64(exprs.head)
  }

  private[functions] def buildCosine(exprs: Seq[Expression]): Expression = {
    requireArity("cosine_sim", "cosine_sim(a: array<double>, b: array<double>)", exprs, 2)
    CosineSim(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit = synchronized {
    val key = System.identityHashCode(spark).toString
    if (!registered.contains(key)) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("simhash64", buildSimhash, "built-in")
      reg.createOrReplaceTempFunction("cosine_sim", buildCosine, "built-in")
      registered += key
    }
  }

  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
  def cosine(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}

/** 64-bit SimHash over array<string> tokens: per token, xxhash64(seed=42)
  * bits vote +1/-1 into 64 counters; result bit i is set iff counter i > 0.
  * Matches TextQueries.simhash64 (xxhash64 default seed 42) exactly.
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))  // type inferred (AbstractDataType is private[sql])
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hash(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(newChild)
}

object SimHash64 {
  /** static kernel shared by interpreted eval and generated code */
  def hash(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      // element-null → xxhash64 returns the seed, same as the HOF form
      val h =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        }
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counters(bit) += 1 else counters(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counters(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** cosine similarity of two array<double> vectors, accumulated
  * left-to-right like the HOF form (deterministic, oracle-identical).
  *
  * Malformed-input contract (matches the HOF form in VectorQueries.cosine):
  * null input, length-mismatched inputs, a null element, or a zero/NaN
  * denominator all yield NULL — never NaN, never a silent prefix-cosine.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.CosineSim.cos($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(newLeft, newRight)
}

/** Per-table LSH bucket ids for one vector against FIXED literal
  * hyperplanes (round-8): the HOF form
  * (`aggregate(zip_with(v, lit(plane), _*_), 0.0, _+_)` per plane)
  * evaluates nTables × bits × dim interpreted lambda calls per row; this
  * compiles to a tight Java loop under whole-stage codegen. Semantics are
  * value-identical to the HOF form on well-formed vectors: the dot product
  * accumulates left-to-right in the same order, `dot > 0` sets bit i, and
  * bucket(t) = Σ bits + t·4096. A malformed vector (length ≠ plane dim, or
  * a null element) made every HOF dot NULL → every bit 0 → bucket t·4096;
  * the kernel reproduces exactly that.
  */
case class LshBucketIds(child: Expression, planes: Array[Array[Double]],
                        nTables: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bucket_ids"

  override def nullSafeEval(input: Any): Any =
    LshBucketIds.buckets(input.asInstanceOf[ArrayData], planes, nTables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBucketIds.buckets($c, $ref, $nTables, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketIds =
    copy(child = newChild)
}

object LshBucketIds {
  /** static kernel shared by interpreted eval and generated code */
  def buckets(v: ArrayData, planes: Array[Array[Double]],
              nTables: Int, bits: Int): ArrayData = {
    val n = v.numElements()
    // a null element nulls every zip_with product in the HOF form → every
    // dot NULL → all bits 0 for every table
    var malformed = false
    var i = 0
    while (i < n && !malformed) { if (v.isNullAt(i)) malformed = true; i += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var acc = t.toLong * 4096L
      var b = 0
      while (b < bits) {
        val p = planes(t * bits + b)
        if (!malformed && n == p.length) {
          var dot = 0.0
          var j = 0
          while (j < p.length) { dot += v.getDouble(j) * p(j); j += 1 }
          if (dot > 0) acc += (1L << b)
        }
        b += 1
      }
      out(t) = acc
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object CosineSim {
  /** null (not NaN) on any malformed input — see CosineSim scaladoc */
  def cos(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val a = x.getDouble(i); val b = y.getDouble(i)
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    val r = dot / (math.sqrt(nx) * math.sqrt(ny))
    if (java.lang.Double.isNaN(r)) null else r
  }
}
