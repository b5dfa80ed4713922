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
}
