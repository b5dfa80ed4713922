package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Theta set algebra: exact below 2^lgK retained entries (the contract
  * the oracle face pins), published-RSE estimation above it, nulls
  * skipped, partials union-mergeable across groups and partitions. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode: distinct count, intersection, difference are exact") {
    val a = spark.range(0, 600).select(concat(lit("k"), col("id")).as("k"))
    val b = spark.range(300, 900).select(concat(lit("k"), col("id")).as("k"))
    def sk(df: org.apache.spark.sql.DataFrame) = ThetaSketch.fromBytes(
      df.repartition(7).agg(ThetaSketch.agg(col("k")).as("s"))
        .head().getAs[Array[Byte]]("s"))
    val (sa, sb) = (sk(a), sk(b))
    sa.isEstimationMode shouldBe false
    ThetaSketch.estimateLong(sa) shouldBe 600L
    ThetaSketch.estimateLong(ThetaSketch.intersect(sa, sb)) shouldBe 300L
    ThetaSketch.estimateLong(ThetaSketch.aNotB(sa, sb)) shouldBe 300L
    ThetaSketch.estimateLong(ThetaSketch.aNotB(sb, sa)) shouldBe 300L
    ThetaSketch.estimateLong(ThetaSketch.union(sa, sb)) shouldBe 900L
  }

  test("per-group partials union to the global distinct; duplicates collapse") {
    val df = spark.range(0, 3000).select(
      pmod(col("id"), lit(8)).as("g"),
      concat(lit("k"), pmod(col("id"), lit(1000))).as("k"))
    val parts = df.groupBy("g").agg(ThetaSketch.agg(col("k")).as("s"))
      .collect().map(r => ThetaSketch.fromBytes(r.getAs[Array[Byte]]("s")))
    parts.length shouldBe 8
    val merged = parts.reduce((x, y) => ThetaSketch.union(x, y))
    merged.isEstimationMode shouldBe false
    ThetaSketch.estimateLong(merged) shouldBe 1000L
  }

  test("nulls skipped; empty sketch is 0; estimation mode flips past 2^lgK") {
    val withNulls = Seq(Some("a"), None, Some("b"), Some("a")).toDF("k")
    val sk = ThetaSketch.fromBytes(
      withNulls.agg(ThetaSketch.agg(col("k")).as("s"))
        .head().getAs[Array[Byte]]("s"))
    ThetaSketch.estimateLong(sk) shouldBe 2L
    val empty = ThetaSketch.fromBytes(
      Seq.empty[String].toDF("k").agg(ThetaSketch.agg(col("k")).as("s"))
        .head().getAs[Array[Byte]]("s"))
    ThetaSketch.estimateLong(empty) shouldBe 0L
    ThetaSketch.estimateLong(ThetaSketch.union(sk, empty)) shouldBe 2L
    // lgK=4 (k=16) saturates on 1000 distincts: estimation mode, and the
    // estimate lands inside a generous 3x the ~25% RSE band
    val tiny = ThetaSketch.fromBytes(
      spark.range(1000).select(concat(lit("k"), col("id")).as("k"))
        .agg(ThetaSketch.agg(col("k"), lgK = 4).as("s"))
        .head().getAs[Array[Byte]]("s"))
    tiny.isEstimationMode shouldBe true
    math.abs(ThetaSketch.estimateLong(tiny) - 1000L) should be < 750L
    an[IllegalArgumentException] should be thrownBy
      ThetaSketchAgg(org.apache.spark.sql.graftbridge.ColumnBridge
        .expression(col("k")), lgK = 2)
  }

  test("both r15 sketch aggregates are callable from SQL text") {
    GraftExtensions.register(spark)
    spark.range(0, 500).select(col("id"), concat(lit("k"), col("id")).as("k"))
      .createOrReplaceTempView("theta_sql_fixture")
    val th = ThetaSketch.fromBytes(
      spark.sql("SELECT graft_theta_sketch(k) AS s FROM theta_sql_fixture")
        .head().getAs[Array[Byte]]("s"))
    ThetaSketch.estimateLong(th) shouldBe 500L
    val qs = QuantileSketch.fromBytes(
      spark.sql(
        "SELECT graft_quantile_sketch(id, 0.01) AS s FROM theta_sql_fixture")
        .head().getAs[Array[Byte]]("s"))
    qs.count shouldBe 500L
    val v = QuantileSketch.query(qs, 0.5).get
    math.abs(v - 250.0) should be <= 6.0 // eps*N + 1
  }
}
