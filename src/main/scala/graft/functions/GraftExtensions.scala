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
  *
  * ASYMMETRY: `graft_product` (the UDAF-backed custom aggregate) is only
  * installed by the runtime `register(spark)` route — a typed
  * `Aggregator` registers through the UDF registry, which the boot-time
  * `SparkSessionExtensions.injectFunction` hook cannot reach. A session
  * booted with `spark.sql.extensions` that needs `graft_product` in SQL
  * text must also call `register` (idempotent).
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

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(tokens) - 64-bit SimHash of an array<string> (xxhash64 votes)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_simhash64 takes 1 argument, got ${args.length}")
        SimHash64(args.head)
      }),
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(text, k) - word k-shingles of a string (k: int literal)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_word_shingles takes 2 arguments, got ${args.length}")
        WordShingles(args.head, intLit(args(1), "graft_word_shingles", "k"))
      }),
    (FunctionIdentifier("graft_minhash_lanes"),
      info("graft_minhash_lanes",
        "graft_minhash_lanes(shingles, h) - h MinHash lane minima of an array<string> (h: int literal)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_minhash_lanes takes 2 arguments, got ${args.length}")
        MinHashLanes(args.head, intLit(args(1), "graft_minhash_lanes", "h"))
      }),
    (FunctionIdentifier("graft_min_gram_hash"),
      info("graft_min_gram_hash",
        "graft_min_gram_hash(text, gram) - rolling min gram-hash fingerprint (gram: int literal)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_min_gram_hash takes 2 arguments, got ${args.length}")
        MinGramHash(args.head, intLit(args(1), "graft_min_gram_hash", "gram"))
      }),
    (FunctionIdentifier("graft_quantile_sketch"),
      info("graft_quantile_sketch",
        "graft_quantile_sketch(x[, eps]) - mergeable GK quantile summary as bytes (agg)"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"graft_quantile_sketch takes 1-2 arguments, got ${args.length}")
        val eps = if (args.length == 2) args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
          // SQL numeric literals like 0.01 parse as DecimalType
          case org.apache.spark.sql.catalyst.expressions.Literal(
            v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_quantile_sketch: eps must be a numeric literal, got $other")
        } else 0.01
        QuantileSketchAgg(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DoubleType), eps)
      }),
    (FunctionIdentifier("graft_theta_sketch"),
      info("graft_theta_sketch",
        "graft_theta_sketch(x[, lgK]) - mergeable theta set sketch as bytes (agg). " +
          "Exact below 2^lgK retained entries. Empty string/binary keys " +
          "count as distinct via an invalid-UTF-8 sentinel (0xC0 0x80): " +
          "string-keyed exact counts match COUNT(DISTINCT) exactly; a " +
          "literal two-byte BINARY key [0xC0,0x80] collides with the " +
          "empty key (impossible for valid UTF-8 text)."),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          s"graft_theta_sketch takes 1-2 arguments, got ${args.length}")
        val lgK = if (args.length == 2)
          intLit(args(1), "graft_theta_sketch", "lgK") else 12
        ThetaSketchAgg(args.head, lgK)
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
