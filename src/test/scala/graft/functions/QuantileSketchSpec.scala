package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mergeable quantile sketch's contract, swept: GK guarantees the
  * returned value's EXACT rank lies within ±eps·N of q·N — on the
  * 1..N fixture a value IS its own rank, so the bound is assertable
  * directly, across quantiles, partitionings, and merge topologies. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val N = 100000L
  private val eps = 0.01
  private val sweep = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def assertBound(qs: org.apache.spark.sql.catalyst.util.QuantileSummaries,
                          n: Long): Unit =
    for (q <- sweep) {
      val v = QuantileSketch.query(qs, q)
        .getOrElse(fail(s"empty sketch at q=$q"))
      withClue(s"q=$q returned $v (n=$n): ") {
        math.abs(v - q * n) should be <= (eps * n + 1)
      }
    }

  test("rank bound holds across the quantile sweep, any partitioning") {
    val df = spark.range(1, N + 1)
      .repartition(17)
      .select(col("id").cast("double").as("x"))
    val bytes = df.agg(QuantileSketch.agg(col("x"), eps).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val qs = QuantileSketch.fromBytes(bytes)
    qs.count shouldBe N
    assertBound(qs, N)
  }

  test("driver-merged per-group partials satisfy the same bound over the union") {
    val parts = spark.range(1, N + 1)
      .select(pmod(col("id"), lit(8)).as("g"), col("id").cast("double").as("x"))
      .groupBy("g")
      .agg(QuantileSketch.agg(col("x"), eps).as("sk"))
      .collect()
    parts.length shouldBe 8
    val merged = parts
      .map(r => QuantileSketch.fromBytes(r.getAs[Array[Byte]]("sk")))
      .reduce(QuantileSketch.merge)
    merged.count shouldBe N
    assertBound(merged, N)
    // merge order moves values, never the bound
    val reversed = parts.reverse
      .map(r => QuantileSketch.fromBytes(r.getAs[Array[Byte]]("sk")))
      .reduce(QuantileSketch.merge)
    assertBound(reversed, N)
  }

  test("nulls are skipped; an empty sketch queries to None and merges as identity") {
    val withNulls = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val qs = QuantileSketch.fromBytes(
      withNulls.agg(QuantileSketch.agg(col("x")).as("sk"))
        .head().getAs[Array[Byte]]("sk"))
    qs.count shouldBe 2L
    val empty = QuantileSketch.fromBytes(
      Seq.empty[Double].toDF("x")
        .agg(QuantileSketch.agg(col("x")).as("sk"))
        .head().getAs[Array[Byte]]("sk"))
    empty.count shouldBe 0L
    QuantileSketch.query(empty, 0.5) shouldBe None
    QuantileSketch.merge(qs, empty).count shouldBe 2L
    QuantileSketch.merge(empty, qs).count shouldBe 2L
    an[IllegalArgumentException] should be thrownBy
      QuantileSketchAgg(ColumnExpr.expr(col("x")), relativeError = 0.0)
  }
}

/** Tiny local alias so the spec can build the case class directly. */
private object ColumnExpr {
  def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
}
