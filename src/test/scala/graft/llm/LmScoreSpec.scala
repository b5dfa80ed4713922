package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NgramLmScore / TextStats.lmScore: backoff-chain semantics with
  * hand-computed integer expectations — including the adversarial
  * corners a mirrored oracle is structurally blind to (bigram present
  * with its target word NOT a unigram; exact threshold boundary). */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val model = TextStats.LmModel(
    unigrams = Seq("cat" -> -100L, "sat" -> -200L, "mat" -> -300L),
    bigrams = Seq(("cat", "sat", -50L), ("sat", "on", -60L)),
    backoffPenalty = -400L, oovPenalty = -1000L)

  private def score(texts: (Long, String)*): Map[Long, (Long, Long, Boolean)] =
    TextStats.lmScore(texts.toDF("doc_id", "text"), model,
        minPerTransition = -500L)
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, s, n, k) => id -> ((s, n, k)) }.toMap

  test("all three tiers: bigram hit, unigram backoff, OOV penalty") {
    // cat→sat bigram −50; sat→on bigram −60 (note: 'on' is NOT a
    // unigram — the bigram tier must win without consulting the unigram
    // table); on→mat: no bigram, unigram mat −300 + backoff −400 = −700;
    // mat→zzz: OOV −1000. Total −1810 over 4 transitions
    // (keeps: −1810 ≥ 4 × −500).
    score(1L -> "cat sat on mat zzz")(1L) shouldBe ((-1810L, 4L, true))
  }

  test("backoff scores the TARGET word, not the source") {
    // zzz→cat: no bigram, target 'cat' is a unigram: −100 − 400 = −500;
    // cat→cat: no bigram, −500 again. A source-word bug would read
    // 'zzz' first and emit OOV.
    score(1L -> "zzz cat cat")(1L) shouldBe ((-1000L, 2L, true))
  }

  test("keep boundary is exact: score == n_trans * threshold keeps") {
    // one transition scoring exactly −500 (= 1 × threshold) keeps;
    // one OOV transition (−1000) drops
    score(1L -> "zzz cat", 2L -> "zzz qqq")(1L) shouldBe ((-500L, 1L, true))
    score(1L -> "zzz cat", 2L -> "zzz qqq")(2L) shouldBe ((-1000L, 1L, false))
  }

  test("fewer than two words: zero transitions, trivially kept") {
    score(1L -> "cat", 2L -> "")(1L) shouldBe ((0L, 0L, true))
    score(1L -> "cat", 2L -> "")(2L) shouldBe ((0L, 0L, true))
  }

  test("whitespace runs split transitions like single spaces") {
    score(1L -> "cat\t\tsat\n\non")(1L) shouldBe ((-110L, 2L, true))
  }
}
