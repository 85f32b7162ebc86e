package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as session functions at session-build time —
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or, config-only (spark-submit):
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * The injected functions are the same Catalyst expressions `native`
  * registers imperatively; this is the deployment-grade path (no code
  * change in the consuming application).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // SQL DML statements (UPDATE / MERGE INTO / arbitrary-predicate DELETE)
    // over graft tables: analyzed plans are rewritten into the engine's
    // distributed LakeTable paths (see graft.sources.GraftDmlRewrite)
    e.injectPostHocResolutionRule(session => new graft.sources.GraftDmlRewrite(session))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => native.buildSimhash(exprs)))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => native.buildCosine(exprs)))
  }
}
