package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional ops need an explicit deterministic order (SURVEY §7.5):
  * zipWithIndex / zip / slice / drop compile to window row_number. */
class PositionalSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(("c", 30), ("a", 10), ("b", 20)).toDF("k", "v")

  test("zipWithIndex attaches 0-based index in the given order") {
    val out = Positional.zipWithIndex(df, Seq(col("k")))
      .orderBy("idx").select("k", "idx").as[(String, Int)].collect()
    out shouldBe Array(("a", 0), ("b", 1), ("c", 2))
  }

  test("zip pairs two frames positionally under their own orders") {
    val left = Seq(1, 2, 3).toDF("x")
    val right = Seq("x", "y", "z").toDF("s")
    val out = Positional.zip(left, Seq(col("x")), right, Seq(col("s")))
      .orderBy("x").as[(Int, String)].collect()
    out shouldBe Array((1, "x"), (2, "y"), (3, "z"))
  }

  test("slice is 0-based end-exclusive") {
    Positional.slice(df, Seq(col("v")), 1, 2)
      .select("k").as[String].collect() shouldBe Array("b")
  }

  test("drop skips the first n in order") {
    Positional.drop(df, Seq(col("v")), 2)
      .select("k").as[String].collect() shouldBe Array("c")
  }
}
