package graft.functions

import graft.SparkSpec
import graft.llm.{Packing, TextStats}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** BpeTokenCount / BpeTokens: greedy longest-match subword tokenization
  * over a fixed vocab. Pinned against an independent straight-line Scala
  * reference (sorted-by-length linear probe — deliberately NOT the trie),
  * so a trie bug and a reference bug can't cancel. */
class BpeKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed, "property failed")

  private val vocab = Seq("scan", "sc", "an", "cust", "omer", "ta", "ble",
    "qu", "ery", "the", "w", "or", "der")

  // independent reference: longest match = first hit in a
  // length-descending probe of the vocab list
  private def refTokens(word: String, v: Seq[String]): Seq[String] = {
    val byLen = v.sortBy(-_.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      byLen.find(t => word.startsWith(t, i)) match {
        case Some(t) => out += t; i += t.length
        case None =>
          val n = Character.charCount(word.codePointAt(i))
          out += word.substring(i, i + n); i += n
      }
    }
    out.toSeq
  }

  private def refCount(text: String, v: Seq[String]): Long =
    text.split(TextStats.WsRun, -1).map(w => refTokens(w, v).length.toLong).sum

  private def kernelCount(texts: Seq[String], v: Seq[String]): Seq[Long] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), TextStats.bpeTokenCount(col("text"), v).as("n"))
      .orderBy("id").as[(Long, Long)].collect().map(_._2).toSeq

  test("greedy longest-match: whole-word entry beats its own prefix chain") {
    // 'scan' (1 token), not 'sc'+'an' (2) — and 'scanx' = 'scan'+'x'
    kernelCount(Seq("scan", "scanx", "scans"), vocab) shouldBe Seq(1L, 2L, 2L)
  }

  test("unmatched code points fall back to single-char tokens") {
    // no vocab entry touches 'z': 3 chars = 3 tokens; mixed word segments
    kernelCount(Seq("zzz", "zscan", "query"), vocab) shouldBe Seq(3L, 2L, 2L)
  }

  test("empty text counts zero tokens; whitespace runs split words") {
    kernelCount(Seq("", "scan\tscan\n\nscan", "  "), vocab) shouldBe
      Seq(0L, 3L, 0L)
  }

  test("vocab order does not change the result (greedy is set-determined)") {
    val texts = Seq("scanner customer thequword", "tablequery worder")
    kernelCount(texts, vocab) shouldBe
      kernelCount(texts, new scala.util.Random(7).shuffle(vocab))
  }

  test("non-ASCII code points pass through as their own tokens") {
    // 'é' and a surrogate-pair emoji each count once; matching is by
    // code point (the unit DuckDB's substr/length count)
    kernelCount(Seq("é", "a😀b", "éscané"), vocab) shouldBe
      Seq(1L, 3L, 3L)
  }

  test("BpeTokens flattens subwords in order and reconstructs each word") {
    val out = Seq((0L, "customer tablequery"), (1L, "scan"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.bpeTokens(col("text"), vocab).as("t"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    out(0)._2 shouldBe Seq("cust", "omer", "ta", "ble", "qu", "ery")
    out(1)._2 shouldBe Seq("scan")
    // concatenating a word's tokens recovers the word (no char dropped)
    out(0)._2.mkString shouldBe "customertablequery"
  }

  test("kernel count matches the independent reference on random words") {
    val wordGen = Gen.listOf(Gen.oneOf(
      Gen.oneOf(vocab), Gen.alphaLowerStr.map(_.take(6)))).map(_.mkString(""))
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    check(Prop.forAllNoShrink(Gen.listOfN(8, textGen)) { texts =>
      kernelCount(texts, vocab) == texts.map(refCount(_, vocab))
    })
  }

  test("ViterbiTokenCount beats the greedy trap and never exceeds greedy") {
    // vocab {ab, bcd, a}: greedy on "abcd" takes ab then falls back char
    // by char (3 pieces); the DP finds a·bcd (2)
    val trapVocab = Seq("ab", "bcd", "a")
    val df = Seq((0L, "abcd"), (1L, "ab"), (2L, ""), (3L, "zzz ab abcd"))
      .toDF("id", "text")
    val out = df.orderBy("id").select(
        TextStats.bpeTokenCount(col("text"), trapVocab).as("g"),
        TextStats.viterbiTokenCount(col("text"), trapVocab).as("v"))
      .as[(Long, Long)].collect()
    out(0) shouldBe ((3L, 2L)) // the trap
    out(1) shouldBe ((1L, 1L))
    out(2) shouldBe ((0L, 0L)) // empty text
    out(3) shouldBe ((3L + 1L + 3L, 3L + 1L + 2L)) // zzz fallback ×3 both
    // law: optimal ≤ greedy on arbitrary words over the shared vocab,
    // and ≥ ceil(coverage lower bound) is implied by both being exact
    // segmentations — pin v ≤ g and v ≥ 1 for non-empty words
    val wordGen = Gen.listOf(Gen.oneOf(
      Gen.oneOf(vocab), Gen.alphaLowerStr.map(_.take(6)))).map(_.mkString(""))
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    check(Prop.forAllNoShrink(Gen.listOfN(8, textGen)) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").orderBy("id")
        .select(TextStats.bpeTokenCount(col("text"), vocab),
          TextStats.viterbiTokenCount(col("text"), vocab))
        .as[(Long, Long)].collect()
      rows.forall { case (g, v) => v <= g && v >= 0 }
    })
  }

  test("UnigramSegment maximizes score, breaks ties to fewest pieces, degenerates to min-piece") {
    // higher total score wins even with MORE pieces
    val w1 = Seq("abcd" -> 10L, "ab" -> 100L, "cd" -> 100L)
    val r1 = Seq((0L, "abcd")).toDF("id", "text")
      .select(TextStats.unigramSegment(col("text"), w1).as("u"))
      .select("u.pieces", "u.score").as[(Long, Long)].head()
    r1 shouldBe ((2L, 200L))
    // equal score → fewest pieces
    val w2 = Seq("ab" -> 5L, "a" -> 5L, "b" -> 0L)
    val r2 = Seq((0L, "ab")).toDF("id", "text")
      .select(TextStats.unigramSegment(col("text"), w2).as("u"))
      .select("u.pieces", "u.score").as[(Long, Long)].head()
    r2 shouldBe ((1L, 5L))
    // all-zero weights: pieces == the min-piece Viterbi count, score 0
    val wordGen = Gen.listOf(Gen.oneOf(
      Gen.oneOf(vocab), Gen.alphaLowerStr.map(_.take(6)))).map(_.mkString(""))
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    val zeroW = vocab.map(_ -> 0L)
    check(Prop.forAllNoShrink(Gen.listOfN(8, textGen)) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").orderBy("id")
        .select(TextStats.viterbiTokenCount(col("text"), vocab).as("v"),
          TextStats.unigramSegment(col("text"), zeroW).as("u"))
        .select(col("v"), col("u.pieces"), col("u.score"))
        .as[(Long, Long, Long)].collect()
      rows.forall { case (v, p, s) => p == v && s == 0L }
    })
  }

  test("BpeTokens count agrees with BpeTokenCount (one walk, two outputs)") {
    val texts = Seq("scan customer query zz", "", "the quick brown fox")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val both = df.select(
        TextStats.bpeTokenCount(col("text"), vocab).as("n"),
        org.apache.spark.sql.functions.size(
          TextStats.bpeTokens(col("text"), vocab)).cast("long").as("m"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, m) => n shouldBe m }
  }

  test("packSequences over BPE tokens emits exactly-full blocks") {
    // every block but the stratum's last must hold exactly blockTokens
    // subwords, and no subword may be dropped (sum reconciles)
    val docs = Seq(
      (0L, "s", "scan scanx query"),
      (1L, "s", "customer customer"),
      (2L, "s", "scan scan"))
      .toDF("doc_id", "source", "text")
    val total = docs.select(sum(TextStats.bpeTokenCount(col("text"), vocab)))
      .as[Long].head()
    val out = Packing.packSequences(docs, blockTokens = 5L,
        tokens = Some(TextStats.bpeTokens(col("text"), vocab)))
      .orderBy("block_id")
      .select("n_tokens").as[Long].collect()
    out.init.foreach(_ shouldBe 5L)
    out.sum shouldBe total
  }
}
