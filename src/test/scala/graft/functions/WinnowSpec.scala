package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WinnowFingerprints: kernel vs an independent Scala reference, a fully
  * hand-computed case, the Schleimer guarantee (shared ≥ w+k−1 token run
  * → shared fingerprint), degenerate shapes and determinism. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val M = 2147483647L

  // independent reference: naive O(m·w) window scan (the kernel uses a
  // deque — agreeing on all inputs is the point)
  private def ref(text: String, k: Int, w: Int): Seq[Long] = {
    val toks = text.split(" ", -1).filter(_.nonEmpty)
    if (toks.isEmpty) return Seq.empty
    val th = toks.map { t =>
      t.codePoints().toArray.foldLeft(-1L) { (h, cp) =>
        if (h < 0) cp.toLong else (h * 31L + cp) % M
      }
    }
    val m = math.max(toks.length - k, 0) + 1
    val gh = (0 until m).map { p =>
      val end = math.min(p + k, toks.length)
      (p + 1 until end).foldLeft(th(p)) { (g, j) => (g * 1000003L + th(j)) % M }
    }
    val ws = math.min(w, m)
    (0 to m - ws).map(s => gh.slice(s, s + ws).min).distinct.sorted
  }

  private def fps(text: String, k: Int = 3, w: Int = 4): Seq[Long] =
    Seq(Tuple1(text)).toDF("text")
      .select(WinnowFingerprints(col("text"), k, w).as("fp"))
      .as[Seq[Long]].head()

  test("kernel matches the reference on varied shapes and parameters") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a a a a a a a a", "one", "", "  spaced   out  tokens ",
      "x y z x y z x y z x y z")
    for (t <- texts; k <- Seq(1, 2, 3, 5); w <- Seq(1, 2, 4, 20))
      fps(t, k, w) shouldBe ref(t, k, w)
  }

  test("hand-computed: single token, k=1, w=1") {
    // 'ab': h = (97*31 + 98) % M = 3105; one gram, one window
    fps("ab", k = 1, w = 1) shouldBe Seq(3105L)
  }

  test("the winnowing guarantee: a shared ≥ w+k-1 token run shares a fingerprint") {
    // span of w+k-1 = 6 tokens planted in two otherwise-different docs
    val span = "alpha beta gamma delta epsilon zeta"
    val a = s"unrelated prefix words here $span and some tail"
    val b = s"$span totally different continuation of text"
    val shared = fps(a).toSet intersect fps(b).toSet
    shared should not be empty
    // and two disjoint-vocabulary docs share nothing
    (fps("aa bb cc dd ee ff gg") intersect fps("hh ii jj kk ll mm nn")) shouldBe empty
  }

  test("w=1 selects every distinct gram hash; output is sorted distinct") {
    val t = "p q r p q r p q"
    val out = fps(t, k = 2, w = 1)
    out shouldBe out.distinct.sorted
    out shouldBe ref(t, 2, 1)
    // repeated text: far fewer fingerprints than grams
    fps("s t " * 50 + "s", k = 2, w = 1).length should be <= 4
  }

  test("null text yields null; empty text yields an empty set") {
    val out = Seq((1L, null: String), (2L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), WinnowFingerprints(col("text"), 3, 4).as("fp"))
      .orderBy("doc_id").as[(Long, Option[Seq[Long]])].collect()
    out(0)._2 shouldBe None
    out(1)._2 shouldBe Some(Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      WinnowFingerprints(lit("x"), 0, 1)
    an[IllegalArgumentException] should be thrownBy
      WinnowFingerprints(lit("x"), 1, 0)
  }
}
