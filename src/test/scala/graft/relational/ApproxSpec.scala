package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch aggregates (A17 approximate tier): the
  * oracle can't check approximations, so the specs pin relative error. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 20000)
    .map(i => (i % 977, i.toDouble))
    .toDF("k", "v")

  test("approx_count_distinct within 5% of exact") {
    val (approx, exact) = df
      .agg(approx_count_distinct("k").as("a"), count_distinct(col("k")).as("e"))
      .as[(Long, Long)].head()
    math.abs(approx - exact).toDouble / exact should be < 0.05
  }

  test("percentile_approx within 1% of exact interpolated percentile") {
    val (approx, exact) = df
      .agg(percentile_approx(col("v"), lit(0.5), lit(10000)).as("a"),
        percentile(col("v"), lit(0.5)).as("e"))
      .as[(Double, Double)].head()
    math.abs(approx - exact) / exact should be < 0.01
  }

  test("count-min partials merge to global estimates, never under-count") {
    // grouped partials merged must estimate GLOBAL frequencies, or
    // pre-aggregated sketches are unsound (the agg_hll_merge contract,
    // CMS flavor); est >= exact is the deterministic one-sided bound
    val parts = df.groupBy(pmod(col("k"), lit(5)))
      .agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("sk"))
      .collect()
    parts should have size 5
    val merged = parts
      .map(r => org.apache.spark.util.sketch.CountMinSketch
        .readFrom(r.getAs[Array[Byte]]("sk")))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    merged.totalCount() shouldBe 20000L
    val exact = df.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    val slack = (2 * 0.001 * 20000).toLong
    exact.foreach { case (k, n) =>
      val est = merged.estimateCount(k.toLong)
      est should be >= n
      est should be <= n + slack
    }
  }
}
