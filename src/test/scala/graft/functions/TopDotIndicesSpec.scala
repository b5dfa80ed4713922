package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopDotIndices: the bounded-selection kernel must rank exactly like a
  * brute-force (dot desc, index asc) sort, including the lowest-index
  * tie-break the IVF lowest-cid contract rides on. */
class TopDotIndicesSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 6

  private def matrix(m: Int, seed: Long = 3L) = {
    val rng = new scala.util.Random(seed)
    Array.fill(m)(Array.fill(dims)(rng.nextGaussian()))
  }

  private def vecs(n: Int, seed: Long = 5L) = {
    val rng = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Array.fill(dims)(rng.nextGaussian().toFloat)))
      .toDF("id", "v")
  }

  test("matches brute-force (dot desc, index asc) ranking for every k") {
    val mat = matrix(9)
    val rows = vecs(40).as[(Long, Array[Float])].collect()
    for (k <- Seq(1, 3, 9, 20)) {
      val kernel = vecs(40).select(col("id"),
          TopDotIndices(col("v"), mat, k).as("idx"))
        .as[(Long, Seq[Int])].collect().toMap
      rows.foreach { case (id, v) =>
        val expected = mat.indices
          .map(r => (r, mat(r).zip(v).map { case (a, b) => a * b.toDouble }.sum))
          .sortBy { case (r, d) => (-d, r) }
          .take(math.min(k, mat.length)).map(_._1)
        kernel(id) shouldBe expected
      }
    }
  }

  test("exact ties resolve to the lowest index") {
    // two identical matrix rows → same dot for any vector
    val base = matrix(1)(0)
    val mat = Array(base, base.clone(), base.map(-_))
    val out = Seq((0L, base.map(_.toFloat))).toDF("id", "v")
      .select(TopDotIndices(col("v"), mat, 2)).head().getSeq[Int](0)
    out shouldBe Seq(0, 1)
  }

  test("k past the matrix size clamps instead of dropping rows") {
    val out = vecs(3).select(TopDotIndices(col("v"), matrix(4), 99).as("idx"))
      .as[Seq[Int]].collect()
    all(out.map(_.length)) shouldBe 4
  }
}
