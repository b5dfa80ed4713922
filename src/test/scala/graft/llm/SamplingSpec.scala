package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling: reproducibility, complement-consistency,
  * fraction accuracy, and the stratified cap's bound + choice. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(10000).toDF("id")

  test("bernoulli is deterministic and complement-consistent") {
    val keep = Sampling.bernoulli(ids, 0.3, Seq(col("id"))).as[Long].collect().toSet
    val again = Sampling.bernoulli(ids, 0.3, Seq(col("id"))).as[Long].collect().toSet
    again shouldBe keep
    // the 0.3 sample is a strict subset of the 0.6 sample under one seed:
    // hash < 300k implies hash < 600k — nested splits stay consistent
    val wider = Sampling.bernoulli(ids, 0.6, Seq(col("id"))).as[Long].collect().toSet
    keep.subsetOf(wider) shouldBe true
  }

  test("bernoulli fraction is accurate on 10k rows") {
    val n = Sampling.bernoulli(ids, 0.3, Seq(col("id"))).count()
    n.toDouble / 10000 shouldBe 0.3 +- 0.02
  }

  test("bernoulli with a different seed selects a different set") {
    val a = Sampling.bernoulli(ids, 0.3, Seq(col("id")), seed = 1L).as[Long].collect().toSet
    val b = Sampling.bernoulli(ids, 0.3, Seq(col("id")), seed = 2L).as[Long].collect().toSet
    a should not be b
  }

  test("capPerGroup keeps at most n rows per group, lowest under the order") {
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L), ("b", 8L), ("c", 5L))
      .toDF("k", "v")
    val out = Sampling.capPerGroup(df, Seq(col("k")), n = 2, order = Seq(col("v")))
      .orderBy("k", "v").as[(String, Long)].collect()
    out shouldBe Array(("a", 1L), ("a", 2L), ("b", 8L), ("b", 9L), ("c", 5L))
  }
}
