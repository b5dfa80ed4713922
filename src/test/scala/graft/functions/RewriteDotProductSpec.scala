package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The optimizer rewrite must be observation-equivalent to the HOF idiom
  * it replaces — including the null-poisoning semantics. */
class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, x) => acc + x)

  test("HOF dot pattern is rewritten to graft_dot in the optimized plan") {
    GraftExtensions.registerRules(spark)
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b").repartition(1)   // block ConvertToLocalRelation folding
    val q = df.select(hofDot.as("d"))
    q.queryExecution.optimizedPlan.toString should include("graft_dot")
    q.as[Double].head() shouldBe 11.0
  }

  test("rewrite preserves HOF null semantics: length mismatch → null") {
    GraftExtensions.registerRules(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b").repartition(1)   // block ConvertToLocalRelation folding
    val q = df.select(hofDot.as("d"))
    q.queryExecution.optimizedPlan.toString should include("graft_dot")
    q.collect()(0).isNullAt(0) shouldBe true
  }

  test("raw FLOAT multiplies are NOT rewritten (float vs double precision)") {
    GraftExtensions.registerRules(spark)
    val df = Seq((Array(0.1f, 0.3f), Array(0.1f, 0.3f))).toDF("a", "b").repartition(1)
    // no double casts → the HOF multiplies in float; the kernel would
    // multiply in double and flip low bits
    val q = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x).as("d"))
    q.queryExecution.optimizedPlan.toString should not include "graft_dot"
  }

  test("non-dot aggregations over zip_with are NOT rewritten") {
    GraftExtensions.registerRules(spark)
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b").repartition(1)
    // sum of pairwise sums — same shape, different lambda: must stay HOF
    val q = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x + y),
      lit(0.0), (acc, x) => acc + x).as("s"))
    q.queryExecution.optimizedPlan.toString should not include "graft_dot"
    q.as[Double].head() shouldBe 10.0
  }

  test("strict and lenient kernels differ exactly on the null cases") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val strict = ColumnBridge.column(DotProduct(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")), strict = true))
    val lenient = VectorFunctions.dot(col("a"), col("b"))
    val r = df.select(strict.as("s"), lenient.as("l")).collect()(0)
    r.isNullAt(0) shouldBe true
    r.getDouble(1) shouldBe 5.0   // common prefix: 1 + 4
  }
}
