package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SignProjection: the one-kernel LSH signature expression must be
  * bit-identical to the naive per-plane formulation it replaced
  * (numTables×bits separate when(dot ≥ 0) columns), with DotProduct's
  * lenient null semantics. */
class SignProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val numTables = 3
  private val bits = 5
  private val dims = 8

  private def planes = {
    val rng = new scala.util.Random(7L)
    Array.fill(numTables * bits)(Array.fill(dims)(rng.nextGaussian()))
  }

  private def vecs = {
    val rng = new scala.util.Random(11L)
    (0L until 50L).map(i => (i, Array.fill(dims)(rng.nextGaussian().toFloat)))
      .toDF("id", "v")
  }

  test("matches the naive per-plane when(dot >= 0) formulation bit for bit") {
    val ps = planes
    val kernel = vecs.select(col("id"),
        SignProjection(col("v"), ps, numTables, bits).as("sigs"))
      .as[(Long, Seq[Long])].collect().toMap
    val naive = vecs.select(col("id") +: (0 until numTables).map { t =>
        (0 until bits).map { j =>
          when(graft.llm.Similarity.dot(col("v"), typedLit(ps(t * bits + j).toSeq)) >= 0,
            lit(1L << j)).otherwise(lit(0L))
        }.reduce(_.bitwiseOR(_)).as(s"sig$t")
      }: _*)
      .collect().map(r => r.getLong(0) -> (1 to numTables).map(r.getLong)).toMap
    kernel.keySet shouldBe naive.keySet
    kernel.foreach { case (id, sigs) => sigs shouldBe naive(id) }
  }

  test("null vector yields null; null elements contribute zero") {
    val ps = planes
    val df = Seq(
      (0L, null.asInstanceOf[Array[Float]]),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
    val out = df.select(col("id"),
        SignProjection(col("v"), ps, numTables, bits).as("sigs"))
      .orderBy("id").collect()
    out(0).isNullAt(1) shouldBe true
    out(1).getSeq[Long](1).length shouldBe numTables
    // a short vector dots over its prefix: same as zero-padding
    val short = Seq((2L, Array(1.0f))).toDF("id", "v")
      .select(SignProjection(col("v"), ps, numTables, bits)).head().getSeq[Long](0)
    val padded = Seq((2L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("id", "v")
      .select(SignProjection(col("v"), ps, numTables, bits)).head().getSeq[Long](0)
    short shouldBe padded
  }

  test("rejects a mis-shaped plane matrix and non-array input") {
    an[IllegalArgumentException] should be thrownBy
      SignProjection(col("v"), planes, numTables + 1, bits)
    val bad = Seq((1L, "x")).toDF("id", "v")
    an[Exception] should be thrownBy
      bad.select(SignProjection(col("v"), planes, numTables, bits)).collect()
  }
}
