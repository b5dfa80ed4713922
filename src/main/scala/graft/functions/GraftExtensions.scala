package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Catalyst integration points for the engine's custom expressions.
  *
  * Two ways in:
  *  - boot-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the SparkSessionExtensions route — survives `newSession()`);
  *  - runtime: `GraftExtensions.register(spark)` on a live session.
  *
  * Either makes the kernels callable from SQL text, e.g.
  * `SELECT graft_dot(a.embedding, b.embedding) FROM ...`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRangeJoin)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }))

  /** Runtime registration on an existing session: the native expressions,
    * the optimizer rewrites, and the custom aggregates (UDAF-backed, so
    * SQL text gets `graft_product` next to the built-ins). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
    spark.udf.register("graft_product",
      org.apache.spark.sql.functions.udaf(graft.agg.Aggs.product))
    registerRules(spark)
  }

  /** Runtime injection of the optimizer rewrites alone. */
  def registerRules(spark: SparkSession): Unit = {
    val rules = Seq(RewriteDotProduct, graft.plans.RewriteRangeJoin)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }
}
