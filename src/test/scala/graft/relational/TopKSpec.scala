package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 3, 30), ("a", 1, 10), ("a", 2, 20), ("a", 5, 50),
    ("b", 9, 90), ("b", 7, 70))
    .toDF("k", "v", "payload")

  test("topKPerGroup keeps the k smallest per group under the struct order") {
    val out = TopK.topKPerGroup(df, Seq(col("k")),
        Seq(col("v"), col("payload")), k = 2)
      .orderBy("k", "v").as[(String, Int, Int)].collect()
    out shouldBe Array(("a", 1, 10), ("a", 2, 20), ("b", 7, 70), ("b", 9, 90))
  }

  test("descending via negation: top-2 largest v per group") {
    val out = TopK.topKPerGroup(df, Seq(col("k")),
        Seq((-col("v")).as("neg_v"), col("payload")), k = 2)
      .select(col("k"), (-col("neg_v")).as("v"))
      .orderBy(col("k"), col("v").desc).as[(String, Int)].collect()
    out shouldBe Array(("a", 5), ("a", 3), ("b", 9), ("b", 7))
  }

  test("matches the window row_number formulation") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("v")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2).select("k", "v", "payload")
    val viaTopK = TopK.topKPerGroup(df, Seq(col("k")),
      Seq(col("v"), col("payload")), k = 2)
    viaTopK.except(viaWindow).count() shouldBe 0
    viaWindow.except(viaTopK).count() shouldBe 0
  }

  test("groups smaller than k return all their rows") {
    TopK.topKPerGroup(df.where(col("k") === "b"), Seq(col("k")),
      Seq(col("v")), k = 10).count() shouldBe 2
  }

  test("equivalent to the window formulation on randomized inputs (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rows = Gen.listOfN(200,
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 40), Gen.choose(0, 1000)))
    val prop = Prop.forAllNoShrink(rows, Gen.choose(1, 6)) { (xs, k) =>
      val data = xs.zipWithIndex
        .map { case ((g, v, p), i) => (s"g$g", v, i) }   // unique tiebreak i
        .toDF("k", "v", "id")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v", "id")
      val expect = data.withColumn("rn", row_number().over(w))
        .where(col("rn") <= k).select("k", "v", "id")
        .collect().map(_.toString).sorted.toSeq
      val got = TopK.topKPerGroup(data, Seq(col("k")), Seq(col("v"), col("id")), k)
        .collect().map(_.toString).sorted.toSeq
      got == expect
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
      .passed, "randomized TopK/window equivalence failed")
  }

  test("plan aggregates with partial combine — no Window/Sort-all operator") {
    val plan = TopK.topKPerGroup(df, Seq(col("k")), Seq(col("v")), k = 2)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should include("Aggregate")
  }
}
