package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native dot-product kernel vs the declarative HOF formulation. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot equals the HOF aggregate(zip_with) formulation bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.7f))).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    val out = df.select(VectorFunctions.dot(col("a"), col("b")).as("n"), hof.as("h"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => n shouldBe h }
    out(0)._1 shouldBe 32.0
  }

  test("graft_dot over double arrays and mixed lengths (common prefix)") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0))).toDF("a", "b")
    df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head() shouldBe 50.0
  }

  test("graft_dot is null-safe: null array → null, null element → skipped") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))))
      .toDF("a", "b")
    val out = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    out(0).isNullAt(0) shouldBe true
    out(1).getDouble(0) shouldBe 11.0
  }

  test("graft_dot rejects non-array inputs at analysis time") {
    val df = Seq((1, 2)).toDF("a", "b")
    an[Exception] should be thrownBy
      df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
  }
}
