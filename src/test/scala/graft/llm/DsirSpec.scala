package graft.llm

import graft.SparkSpec
import graft.functions.{HashedNgramBuckets, HashedNgramScore}
import org.apache.spark.sql.functions._

/** DSIR (TextStats.dsir + the HashedNgram kernels): kernel-vs-reference
  * equivalence on the shared hash chain, selection semantics on a
  * planted two-vocabulary corpus, degenerate shapes, and partitioning
  * invariance. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val M = 2147483647L

  // independent reference for the bucket stream (winnowing hash chain
  // mod buckets — WinnowSpec's ref with a final mod)
  private def refBuckets(text: String, k: Int, buckets: Int): Seq[Long] = {
    val toks = text.split(" ", -1).filter(_.nonEmpty)
    if (toks.isEmpty) return Seq.empty
    val th = toks.map { t =>
      t.codePoints().toArray.foldLeft(-1L) { (h, cp) =>
        if (h < 0) cp.toLong else (h * 31L + cp) % M
      }
    }
    val m = math.max(toks.length - k, 0) + 1
    (0 until m).map { p =>
      val end = math.min(p + k, toks.length)
      (p + 1 until end).foldLeft(th(p)) { (g, j) => (g * 1000003L + th(j)) % M } % buckets
    }
  }

  private def kernelBuckets(text: String, k: Int, buckets: Int): Seq[Long] =
    Seq(Tuple1(text)).toDF("text")
      .select(HashedNgramBuckets(col("text"), k, buckets).as("b"))
      .as[Seq[Long]].head()

  test("bucket kernel matches the reference on varied shapes") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog", "a a a a", "one",
      "", "  spaced   out  tokens ", "x y z x y z")
    for (t <- texts; k <- Seq(1, 2, 3); b <- Seq(2, 64, 1021))
      kernelBuckets(t, k, b) shouldBe refBuckets(t, k, b)
  }

  test("score kernel = 1024 * sum(weights[bucket]) div gram count; null on token-free text") {
    val b = 8
    val weights = Array.tabulate(b)(i => (i * 7 - 13).toLong)
    val texts = Seq("alpha beta gamma delta", "one", "mixed bag of words here")
    for (t <- texts; k <- Seq(1, 2)) {
      val bs = refBuckets(t, k, b)
      val expected = bs.map(i => weights(i.toInt)).sum * 1024L / bs.length
      Seq(Tuple1(t)).toDF("text")
        .select(HashedNgramScore(col("text"), k, b, weights).as("s"))
        .as[Long].head() shouldBe expected
    }
    val nulls = Seq(Tuple1(""), Tuple1("   "), Tuple1(null: String)).toDF("text")
      .select(HashedNgramScore(col("text"), 2, b, weights).as("s"))
      .collect()
    nulls.foreach(r => assert(r.isNullAt(0), "token-free/null text must score NULL"))
  }

  test("negative score quantization truncates toward zero in both engines' convention") {
    // weights all -3: score = -3*1024 exactly; -3072 div 1024 = -3 (trunc)
    val weights = Array.fill(4)(-3L)
    val s = Seq(Tuple1("a b c")).toDF("text")
      .select(HashedNgramScore(col("text"), 1, 4, weights).as("s"))
      .as[Long].head()
    s shouldBe -3L * 1024L
  }

  // planted corpus: target docs draw from vocab A, junk docs from vocab
  // B (disjoint), a few mixed docs in between — DSIR must rank pure-A
  // above mixed above pure-B
  private def planted(n: Int) = {
    val a = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val bvoc = Seq("zork", "quux", "blorp", "fnord", "grue")
    (0 until n).map { i =>
      val (vocab, tag) =
        if (i % 3 == 0) (a, "tgt")
        else if (i % 3 == 1) (bvoc, "junk")
        else (a.take(3) ++ bvoc.take(2), "mixed")
      val words = (0 until 12).map(j => vocab((i * 7 + j * 5) % vocab.size))
      (i.toLong, words.mkString(" "), tag)
    }.toDF("doc_id", "text", "tag")
  }

  test("selection keeps target-distribution docs first on a planted two-vocabulary corpus") {
    val docs = planted(90)
    val kept = TextStats.dsir(docs, isTarget = col("tag") === "tgt",
      keepFraction = 0.34, k = 2, buckets = 64, quantum = 256L)
    val keptTags = kept.join(docs, "doc_id").groupBy("tag").count()
      .as[(String, Long)].collect().toMap
    // 30 tgt docs, keep ~31: the kept set must be dominated by tgt and
    // contain NO pure-junk docs
    assert(keptTags.getOrElse("tgt", 0L) >= 25L,
      s"target docs must dominate the kept set, got $keptTags")
    assert(keptTags.getOrElse("junk", 0L) == 0L,
      s"pure off-distribution docs must not survive a 34% cut, got $keptTags")
  }

  test("dsirAgainst: a separate target corpus drives selection; matches dsir's ranking direction") {
    val docs = planted(90)
    // target corpus = pure target-vocab docs, as a SEPARATE frame with
    // overlapping ids (ids don't matter on the target side)
    val target = (0 until 30).map { i =>
      val a = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      (i.toLong, (0 until 12).map(j => a((i * 7 + j * 5) % a.size)).mkString(" "))
    }.toDF("doc_id", "text")
    val kept = TextStats.dsirAgainst(docs.select("doc_id", "text"), target,
      keepFraction = 0.34, quantum = 256L)
    val keptTags = kept.join(docs, "doc_id").groupBy("tag").count()
      .as[(String, Long)].collect().toMap
    assert(keptTags.getOrElse("tgt", 0L) >= 25L,
      s"target-matching docs must dominate, got $keptTags")
    assert(keptTags.getOrElse("junk", 0L) == 0L,
      s"off-distribution docs must not survive, got $keptTags")
  }

  test("dsir is invariant under input partitioning and drops token-free docs") {
    val docs = planted(60).union(Seq((999L, "   ", "tgt")).toDF("doc_id", "text", "tag"))
    val r1 = TextStats.dsir(docs, col("tag") === "tgt", 0.5, quantum = 256L)
      .orderBy("doc_id").collect()
    val r2 = TextStats.dsir(docs.repartition(13), col("tag") === "tgt", 0.5, quantum = 256L)
      .orderBy("doc_id").collect()
    r1 shouldBe r2
    assert(!r1.exists(_.getLong(0) == 999L), "token-free doc must be dropped")
  }

  test("keep fraction is honored up to tie mass at one quantum boundary") {
    // gradient corpus: doc i mixes i%13 target-vocab words into a
    // 12-word doc — scores SPREAD (the point-mass percentile lesson:
    // a few-class fixture piles tie mass on the cut bucket)
    val a = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val bvoc = Seq("zork", "quux", "blorp", "fnord", "grue")
    val docs = (0 until 120).map { i =>
      val nA = i % 13
      val words = (0 until 12).map { j =>
        if (j < nA) a((i + j * 3) % a.size) else bvoc((i * 5 + j) % bvoc.size)
      }
      (i.toLong, words.mkString(" "), if (nA >= 7) "tgt" else "junk")
    }.toDF("doc_id", "text", "tag")
    val n = 120L
    val kept = TextStats.dsir(docs, col("tag") === "tgt", 0.25, quantum = 64L).count()
    // ties can only ADD docs at the cut bucket: kept >= 25% and, with a
    // spread score distribution, within a few docs of it
    assert(kept >= n / 4, s"kept $kept of $n, expected >= ${n / 4}")
    assert(kept <= n / 4 + 12, s"kept $kept of $n — tie mass exploded")
  }
}
