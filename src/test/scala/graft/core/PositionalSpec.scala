package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional ops need an explicit deterministic order (SURVEY §7.5):
  * zipWithIndex / zip / slice / drop compile to a range-partitioned
  * two-pass offset index (no single-partition global window). */
class PositionalSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(("c", 30), ("a", 10), ("b", 20)).toDF("k", "v")

  test("zipWithIndex attaches 0-based index in the given order") {
    val out = Positional.zipWithIndex(df, Seq(col("k")))
      .orderBy("idx").select("k", "idx").as[(String, Long)].collect()
    out shouldBe Array(("a", 0L), ("b", 1L), ("c", 2L))
  }

  test("zipWithIndex is globally contiguous across many partitions") {
    val big = spark.range(0, 10000).toDF("n").repartition(13)
    val out = Positional.zipWithIndex(big, Seq(col("n")))
    import org.apache.spark.sql.functions.{max => fmax, min => fmin, countDistinct}
    val r = out.agg(fmin("idx"), fmax("idx"), countDistinct("idx")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((0L, 9999L, 10000L))
    // index order must agree with the requested order
    out.where(col("idx") === col("n")).count() shouldBe 10000L
  }

  test("zipWithIndex on an empty frame yields an empty indexed frame") {
    val empty = df.where(col("v") > 1000)
    Positional.zipWithIndex(empty, Seq(col("k"))).count() shouldBe 0L
    Positional.slice(empty, Seq(col("k")), 0, 5).count() shouldBe 0L
  }

  test("zipWithIndex plan has no single-partition global window") {
    val plan = Positional.zipWithIndex(df, Seq(col("k")))
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "SinglePartition"
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
