package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text-analysis operators (SURVEY §2.9 L4). */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("langId scores profiles and picks the argmax deterministically") {
    val docs = Seq(
      (0L, "xx", "the fast scan the fast"),    // en markers dominate
      (1L, "xx", "key row merge key"),         // de markers dominate
      (2L, "xx", "zzz qqq www"))               // no markers → tie → 'de' (lexicographic)
      .toDF("doc_id", "lang", "text")
    val out = TextStats.langId(docs)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    out(0L) shouldBe "en"
    out(1L) shouldBe "de"
    out(2L) shouldBe "de"
  }

  test("langId keeps incoming columns (e.g. the true label)") {
    val docs = Seq((0L, "en", "the fast scan")).toDF("doc_id", "lang", "text")
    val cols = TextStats.langId(docs).columns.toSet
    cols should contain("lang")
    cols should not contain "text"
  }

  test("quality ratios match hand computation") {
    // "the the cat": 3 tokens, 2 stopwords, 2 distinct
    val docs = Seq((0L, "the the cat")).toDF("doc_id", "text")
    val r = TextStats.quality(docs).head()
    r.getLong(1) shouldBe 3                       // n_tokens
    r.getDouble(2) shouldBe 3.0 +- 1e-9           // mean token length (11-3+1)/3
    r.getDouble(3) shouldBe 0.6667 +- 1e-4        // stopword ratio
    r.getDouble(4) shouldBe 0.6667 +- 1e-4        // distinct ratio
  }

  test("tokenCounts: whitespace vs regex tokens") {
    val docs = Seq((0L, "ab 12 cd!")).toDF("doc_id", "text")
    val r = TextStats.tokenCounts(docs).head()
    r.getLong(1) shouldBe 3   // ws tokens
    r.getLong(2) shouldBe 4   // ab, 12, cd, !
    r.getLong(3) shouldBe 9   // chars
  }

  test("charEntropy: exact fixed-point values, edges, and the kernel law") {
    val docs = Seq(
      (0L, "aaaa"),            // one class → 0 bits
      (1L, "abcd"),            // 4 distinct → exactly 2·1024
      (2L, "aabb"),            // two classes of 2 → exactly 1·1024
      (3L, "aab"),             // H = log2(3) − 2/3 ≈ 0.918 bits
      (4L, ""),                // empty → dropped, no distribution to measure
      (5L, "abcdefgh"))        // 8 distinct → exactly 3·1024
      .toDF("doc_id", "text")
    val out = TextStats.charEntropy(docs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    out.map(_._1) shouldBe Array(0L, 1L, 2L, 3L, 5L) // 4L dropped
    out.map(_._3) shouldBe Array(0L, 2048L,  1024L,
      // n=3: (3·l2(3) − (2·l2(2) + 1·l2(1))) div 3; l2(3) = 1536
      (3L * 1536L - 2L * 1024L) / 3L,
      3072L)
    // the kernel IS the naive histogram definition, on arbitrary input
    def naive(s: String): Long = {
      val cps = s.codePoints().toArray
      val n = cps.length.toLong
      if (n == 0) 0L
      else {
        def l2(x: Long): Long = {
          val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
          msb * 1024L + ((x << 10) >> msb) - 1024L
        }
        val acc = cps.groupBy(identity).values
          .map(g => g.length.toLong * l2(g.length.toLong)).sum
        (n * l2(n) - acc) / n
      }
    }
    val rnd = new scala.util.Random(7)
    val samples = (1 to 50).map(_ =>
      (1 to rnd.nextInt(300) + 1).map(_ => (rnd.nextInt(90) + 32).toChar).mkString) ++
      Seq("päö π∆ मिश्रित 😀😀 text")  // non-ASCII incl. a non-BMP codepoint
    val got = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val kernel = TextStats.charEntropy(got).orderBy("doc_id")
      .select("entropy_fp").as[Long].collect()
    kernel shouldBe samples.map(naive).toArray
  }

  test("compressionRatio: repetitive text compresses below varied text, laws hold") {
    val rep = ("spam " * 200).trim                  // highly templated
    val varied = (0 until 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val docs = Seq((0L, rep), (1L, varied), (2L, "")).toDF("doc_id", "text")
    val out = TextStats.compressionRatio(docs).orderBy("doc_id")
      .as[(Long, Double)].collect().toMap
    out(0L) should be < out(1L)     // the quality signal: templated << varied
    out(0L) should be > 0.0
    out(1L) should be < 1.1         // deflate overhead bound on small docs
    out(2L) shouldBe 1.0            // empty-text convention
    // determinism under a different partitioning (per-thread Deflaters)
    TextStats.compressionRatio(docs.repartition(5)).orderBy("doc_id")
      .as[(Long, Double)].collect().toMap shouldBe out
  }

  test("vocab counts tokens and cuts top-K deterministically on ties") {
    val docs = Seq(
      (0L, "a b b c c c"),
      (1L, "d d d a"))
      .toDF("doc_id", "text")
    // counts: c=3, d=3, a=2, b=2 → top-3 = c,d (tie → token asc) then a
    val out = TextStats.vocab(docs, topK = 3).as[(String, Long)].collect()
    out shouldBe Array(("c", 3L), ("d", 3L), ("a", 2L))
    // the cut must be TakeOrderedAndProject — bounded per-partition
    // top-k merged on the driver, never a global sort
    TextStats.vocab(docs, topK = 3).queryExecution.executedPlan.toString should
      include("TakeOrderedAndProject")
  }

  test("tfIdf ranks rare-but-frequent terms first, rational idf in basis points") {
    val docs = Seq(
      (0L, "cat cat dog"),
      (1L, "dog bird"),
      (2L, "cat fish fish"))
      .toDF("doc_id", "text")
    // N=3; df: cat 2, dog 2, bird 1, fish 1
    // score_bp = round(1e4·tf·N/df): cat@0 30000, dog 15000, bird 30000, fish 60000
    val out = TextStats.tfIdf(docs, topK = 2)
      .select("doc_id", "term", "tf", "df", "score_bp", "rank")
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (0L, "cat", 2L, 2L, 30000L, 1L),
      (0L, "dog", 1L, 2L, 15000L, 2L),
      (1L, "bird", 1L, 1L, 30000L, 1L),
      (1L, "dog", 1L, 2L, 15000L, 2L),
      (2L, "fish", 2L, 1L, 60000L, 1L),
      (2L, "cat", 1L, 2L, 15000L, 2L))
    // passing nDocs keeps the operator lazy and must not change results
    TextStats.tfIdf(docs, topK = 2, nDocs = 3L)
      .select("doc_id", "term", "tf", "df", "score_bp", "rank")
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Long, Long)].collect() shouldBe out
  }

  test("blockDomains normalizes hosts and drops blocked domains, narrow filter") {
    val docs = Seq(
      (0L, "https://www.Evil.example.com/x?q=1"),
      (1L, "http://good.example.com:8080/y"),
      (2L, "https://evil.example.com/z"),
      (3L, "not a url at all"),
      (4L, "HTTPS://WWW.Evil.example.com/x")) // case tricks must not evade the blocklist
      .toDF("doc_id", "url")
    val out = TextStats.blockDomains(docs, Seq("evil.example.com"))
      .select("doc_id", "domain").as[(Long, String)].collect().toMap
    out shouldBe Map(1L -> "good.example.com", 3L -> "")
    // a literal blocklist must stay a filter — no join/shuffle in the plan
    val plan = TextStats.blockDomains(docs, Seq("evil.example.com"))
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Exchange"
  }

  test("domainGate blocks by quality mean and crowding cap; unparsed rows pass through") {
    // quality arithmetic worked by hand against qualityBp's definition:
    // all-stopword text → qbp 0; 4 distinct non-stopwords → 10000;
    // "x x y y" (dr 5000, sr 0) → exactly 5000 — the threshold boundary
    val lowQ = "the the the the"
    val hiQ = "alpha beta gamma delta"
    val mid = "x x y y"
    val docs = Seq(
      (0L, "https://spam.com/a", lowQ), // mean 0 < 5000 → blocked
      (1L, "https://spam.com/b", lowQ),
      (2L, "https://good.com/a", hiQ), // mean 10000 → kept
      (3L, "https://good.com/b", hiQ),
      (4L, "https://good.com/c", hiQ),
      (5L, "https://edge.com/a", mid), // mean EXACTLY 5000 → kept (strict <)
      (6L, "https://crowd.com/a", hiQ), // high quality but 4 docs > cap 3 → blocked
      (7L, "https://crowd.com/b", hiQ),
      (8L, "https://crowd.com/c", hiQ),
      (9L, "https://crowd.com/d", hiQ),
      (10L, "not a url", lowQ)) // unparsed: worst quality, still passes through
      .toDF("doc_id", "url", "text")
    val out = TextStats.domainGate(docs, minAvgQualityBp = 5000L, maxDocsPerDomain = 3L)
    out.select("doc_id").as[Long].collect().toSet shouldBe Set(2L, 3L, 4L, 5L, 10L)
    out.where(col("doc_id") === 10L).select("domain").as[String].head() shouldBe ""
  }

  test("domainGate anti-joins a broadcast blocklist — the corpus is never exchanged") {
    val docs = Seq((0L, "https://a.com/x", "w w")).toDF("doc_id", "url", "text")
    val plan = TextStats.domainGate(docs, 5000L, 10L)
      .queryExecution.executedPlan.toString
    plan should include("LeftAnti")
    plan should include("Broadcast")
  }

  test("domainGate rejects reserved columns and malformed thresholds") {
    val docs = Seq((0L, "https://a.com/x", "w")).toDF("doc_id", "url", "text")
    an[IllegalArgumentException] should be thrownBy
      TextStats.domainGate(docs.withColumn("domain", lit("d")), 5000L, 10L)
    an[IllegalArgumentException] should be thrownBy
      TextStats.domainGate(docs, 10001L, 10L)
    an[IllegalArgumentException] should be thrownBy
      TextStats.domainGate(docs, 5000L, 0L)
  }

  test("normalize lowercases, collapses whitespace, trims, and counts removals") {
    val docs = Seq(
      (0L, "  Hello   WORLD \t again\n"),
      (1L, "clean"),
      (2L, "\t\t"))  // whitespace-only → empty
      .toDF("doc_id", "text")
    val out = TextStats.normalize(docs).orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    out(0) shouldBe ((0L, "hello world again", 7L))
    out(1) shouldBe ((1L, "clean", 0L))
    out(2) shouldBe ((2L, "", 2L))
  }

  test("qualityGate flags each rule independently and keeps the conjunction") {
    val docs = Seq(
      (0L, "en", "one two three four"),        // passes all (min=2, max=10)
      (1L, "de", "one two three four"),        // fail_lang
      (2L, "en", "one"),                       // fail_len (1 token < 2)
      (3L, "en", "a b a b a b a b"))           // fail_rep (6/7 bigrams repeat)
      .toDF("doc_id", "lang", "text")
    val out = TextStats.qualityGate(docs, targetLang = "en",
        minTokens = 2, maxTokens = 10, maxRepetition = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "fail_lang", "fail_len", "fail_rep", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    out(0) shouldBe ((0L, false, false, false, true))
    out(1) shouldBe ((1L, true, false, false, false))
    out(2) shouldBe ((2L, false, true, false, false))
    out(3) shouldBe ((3L, false, false, true, false))
  }

  test("qualityGate fails closed on NULL lang/text — accounting stays exhaustive") {
    val docs = Seq(
      (0L, Some("en"), Some("one two three")),  // clean
      (1L, None, Some("one two three")),        // NULL lang → fail_lang
      (2L, Some("en"), None))                   // NULL text → fail_len
      .toDF("doc_id", "lang", "text")
    val out = TextStats.qualityGate(docs, targetLang = "en",
        minTokens = 2, maxTokens = 10, maxRepetition = 0.5)
      .orderBy("doc_id")
      .select("doc_id", "fail_lang", "fail_len", "fail_rep", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    out(0) shouldBe ((0L, false, false, false, true))
    out(1) shouldBe ((1L, true, false, false, false))
    out(2) shouldBe ((2L, false, true, false, false))
    // the invariant the coalesce protects: every doc is kept or in ≥1 bucket
    out.foreach { case (_, fl, fln, fr, keep) =>
      (keep || fl || fln || fr) shouldBe true
    }
  }

  test("blockDomains rejects a pre-existing domain column instead of overwriting") {
    val docs = Seq((0L, "https://a.example.com/x", "caller-data"))
      .toDF("doc_id", "url", "domain")
    an[IllegalArgumentException] should be thrownBy
      TextStats.blockDomains(docs, Seq("a.example.com"))
  }

  test("normalize collapses vertical tab (\\x0B) — explicit class matches RE2/DuckDB") {
    // Java's \s includes \x0B but RE2's does not; WsRun lists the class
    // explicitly so both engines collapse it identically
    val docs = Seq((0L, "a\u000Bb")).toDF("doc_id", "text")
    val out = TextStats.normalize(docs).as[(Long, String, Long)].collect()
    out(0) shouldBe ((0L, "a b", 0L))
  }

  test("repetition scores duplicate-bigram fraction with round-half-up ratio") {
    val docs = Seq(
      (0L, "a b a b a"),   // bigrams: ab,ba,ab,ba → 4 total, 2 distinct → 0.5
      (1L, "x y z"),       // xy,yz → no repeats → 0.0
      (2L, "w"))           // short text → 1 degenerate shingle, 0 repeats
      .toDF("doc_id", "text")
    val out = TextStats.repetition(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    out(0) shouldBe ((0L, 4L, 2L, 0.5))
    out(1) shouldBe ((1L, 2L, 2L, 0.0))
    out(2) shouldBe ((2L, 1L, 1L, 0.0))
  }

  test("fingerprint differential self-oracle: independent formulation + winnowing laws") {
    // xxhash64 has no DuckDB analog, so llm_fingerprint can never be
    // oracle-gated — this is the DuckDB-free substitute: a synthetic
    // corpus with the sf tables' statistical profile, checked against an
    // INDEPENDENT Spark formulation (built-in HOF over substr positions —
    // a different execution path from the MinGramHash codegen kernel),
    // plus the winnowing laws the operator's contract promises.
    val gram = 5
    val corpus = spark.range(500).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), lit(30)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(300)))), " ").as("text"))
    val kernel = TextStats.fingerprint(corpus, gram)
      .as[(Long, Long)].collect().toMap
    val hof = corpus.select(col("doc_id"),
        array_min(transform(
          sequence(lit(1), greatest(
            org.apache.spark.sql.functions.length(col("text")) - (gram - 1), lit(1))),
          i => xxhash64(col("text").substr(i, lit(gram))))).as("fingerprint"))
      .as[(Long, Long)].collect().toMap
    kernel shouldBe hof
    // law 1: appending a suffix only ADDS grams, so the min fingerprint
    // is monotone non-increasing under any append
    val appended = TextStats.fingerprint(
        corpus.select(col("doc_id"), concat(col("text"), lit(" trailing edit")).as("text")),
        gram)
      .as[(Long, Long)].collect().toMap
    kernel.foreach { case (id, fp) => assert(appended(id) <= fp) }
    // law 2: partition-invariance — same values under a different layout
    val repart = TextStats.fingerprint(corpus.repartition(7), gram)
      .as[(Long, Long)].collect().toMap
    repart shouldBe kernel
  }

  test("compressibilityProxy ranks a redundancy ladder exactly as deflate does") {
    // The integer face (llm_compression_q gates its arithmetic against
    // DuckDB); here the FAMILY tie: on a planted redundancy ladder —
    // same length, increasing gram duplication — the proxy's ranking
    // must be the inverse of deflate's compression_ratio ranking
    // (more duplication ⇒ higher proxy, lower deflate ratio).
    val rungs = Seq(
      // 48 tokens each: 0% / 50% / 75% / ~100% repeated phrase mass
      (0L, (0 until 48).map(i => s"u$i").mkString(" ")),
      (1L, ((0 until 24).map(i => s"v$i") ++
        Seq.fill(8)(Seq("rep", "eat", "ed")).flatten).mkString(" ")),
      (2L, ((0 until 12).map(i => s"w$i") ++
        Seq.fill(12)(Seq("rep", "eat", "ed")).flatten).mkString(" ")),
      (3L, Seq.fill(16)(Seq("rep", "eat", "ed")).flatten.mkString(" ")))
      .toDF("doc_id", "text")
    val proxy = TextStats.compressibilityProxy(rungs)
      .as[(Long, Long)].collect().toMap
    val deflate = TextStats.compressionRatio(rungs)
      .as[(Long, Double)].collect().toMap
    val byProxy = proxy.toSeq.sortBy(_._2).map(_._1)
    val byDeflate = deflate.toSeq.sortBy(-_._2).map(_._1)
    byProxy shouldBe byDeflate           // identical ranking, inverted axes
    byProxy shouldBe Seq(0L, 1L, 2L, 3L) // and it is the planted ladder
    // all-distinct rung sits at the l2(1)=0 floor; each rung strictly up
    proxy(0L) shouldBe 0L
    proxy.toSeq.sortBy(_._1).map(_._2).sliding(2)
      .foreach { case Seq(a, b) => assert(a < b) }
  }

  test("fingerprintPoly bit-matches an independent reference; shares the family's laws") {
    // The cross-engine sibling (llm_fingerprint_poly gates it against
    // DuckDB) — here the DuckDB-free leg: the codegen kernel against an
    // independent driver-side Scala reference (sliding window over code
    // points, same base-31 chain), plus the family laws and the edges
    // the fixture corpus can't hit (unicode, shorter-than-gram, empty).
    val gram = 5
    val M = 2147483647L
    def ref(text: String): Option[Long] = {
      val cps = text.codePoints().toArray.map(_.toLong)
      if (cps.isEmpty) None
      else Some(cps.sliding(gram, 1).take(math.max(cps.length - gram + 1, 1))
        .map(g => g.tail.foldLeft(g.head)((a, b) => (a * 31L + b) % M)).min)
    }
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "abc"),                // shorter than gram: one whole-text hash
      (2L, "ü"),                  // single non-ASCII code point
      (3L, "naïve café — résumé"),
      (4L, "😀 emoji leads"), // surrogate pair (astral plane)
      (5L, "aaaaaaaa"))           // degenerate repeats
    val out = TextStats.fingerprintPoly(rows.toDF("doc_id", "text"), gram)
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, t) => Some(out(id)) shouldBe ref(t) }
    // empty text carries no gram: filtered, not a sentinel
    TextStats.fingerprintPoly(Seq((9L, "")).toDF("doc_id", "text"), gram)
      .count() shouldBe 0L
    // family law: appending only ADDS grams → min is monotone non-increasing
    val corpus = spark.range(200).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), lit(20)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(300)))), " ").as("text"))
    val base = TextStats.fingerprintPoly(corpus, gram).as[(Long, Long)].collect().toMap
    val appended = TextStats.fingerprintPoly(
        corpus.select(col("doc_id"), concat(col("text"), lit(" zz tail")).as("text")),
        gram)
      .as[(Long, Long)].collect().toMap
    base.foreach { case (id, fp) => assert(appended(id) <= fp) }
    // every hash stays inside the Mersenne field (the cross-engine bound)
    base.values.foreach(v => assert(v >= 0L && v < M))
  }

  test("fingerprint is deterministic and shifts under content change") {
    val docs = Seq((0L, "abcdefghij"), (1L, "abcdefghij"), (2L, "abcdefghiX"))
      .toDF("doc_id", "text")
    val fp = TextStats.fingerprint(docs).as[(Long, Long)].collect().toMap
    fp(0L) shouldBe fp(1L)
    // a trailing edit can only change the tail grams; min MAY survive — just
    // assert determinism and non-null
    fp.values.foreach(v => v should not be 0L)
  }

  test("redact scrubs planted emails, IPs and SSN-shaped ids, leaves the rest") {
    val docs = Seq(
      (0L, "mail me at j.doe+x@corp.example.com today"),
      (1L, "server 192.168.0.1 answered"),
      (2L, "ssn 123-45-6789 on file; order 12-345 untouched"),
      (3L, "nothing sensitive here 1.2 about 3.4"))
      .toDF("doc_id", "text")
    val r = TextStats.redact(docs)
      .orderBy("doc_id").as[(Long, String)].collect().map(_._2)
    r(0) shouldBe "mail me at <EMAIL> today"
    r(1) shouldBe "server <IP> answered"
    r(2) shouldBe "ssn <ID> on file; order 12-345 untouched"
    r(3) shouldBe "nothing sensitive here 1.2 about 3.4"
  }

  test("adaptiveLengthGate cuts at exact discrete percentiles") {
    // 10 docs with token counts 1..10: cut(p) = smallest count with
    // cdf >= ceil(p·10) → lo = 2 (ceil(0.2·10)=2), hi = 8 → keep 2..8
    val docs = (1 to 10)
      .map(i => (i.toLong, (1 to i).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextStats.adaptiveLengthGate(docs, 0.2, 0.8)
      .orderBy("doc_id").as[(Long, Long)].collect()
    out.map(_._2) shouldBe (2L to 8L).toArray
  }

  test("adaptiveLengthGate full band keeps everything; cuts are partition-invariant") {
    val docs = (1 to 20)
      .map(i => (i.toLong, ("w " * (i % 5 + 1)).trim))
      .toDF("doc_id", "text")
    TextStats.adaptiveLengthGate(docs, 0.0, 1.0).count() shouldBe 20L
    val a = TextStats.adaptiveLengthGate(docs, 0.25, 0.75)
      .select("doc_id").as[Long].collect().toSet
    val b = TextStats.adaptiveLengthGate(docs.repartition(7), 0.25, 0.75)
      .select("doc_id").as[Long].collect().toSet
    b shouldBe a
  }

  test("adaptiveLengthGate's tokenCount override drives BOTH the cuts and the gate") {
    // the override counts CHARACTERS: docs have 1..10 chars but a
    // CONSTANT ws-token count (1), so any path still reading the default
    // metric degenerates (all lengths equal → band keeps everything);
    // with the override, lengths 1..10 → cuts 2..8, same shape as the
    // percentile spec above
    val docs = (1 to 10)
      .map(i => (i.toLong, "x" * i))
      .toDF("doc_id", "text")
    val out = TextStats.adaptiveLengthGate(docs, 0.2, 0.8,
        tokenCount = Some(
          org.apache.spark.sql.functions.length(col("text")).cast("long")))
      .orderBy("doc_id").as[(Long, Long)].collect()
    out.map(_._2) shouldBe (2L to 8L).toArray
    out.map(_._1) shouldBe (2L to 8L).toArray
  }

  test("qualityTiers buckets by exact discrete percentile cuts, ties land high") {
    // six docs with hand-computed quality_bp 0, 2500, 5000, 7500, 8333,
    // 10000 (one each); k=3 → cuts at the ceil(6i/3)-th order statistic:
    // cut1 = 2500 (cum≥2), cut2 = 7500 (cum≥4); tier = #cuts ≤ score →
    // {0}=0, {2500,5000}=1, {7500,8333,10000}=2 — worked independently
    // from the order-statistic definition, not mirrored from the code
    val docs = Seq(
      (0L, "the the the the"),      // q 0
      (1L, "a a a a"),              // dr 2500, sr 10000 → wait: 'a' IS a stopword
      (2L, "x x y y"),              // q 5000
      (3L, "m b c c"),              // q 7500 (no stopwords; dr 7500)
      (4L, "p q r s t t"),          // q 8333
      (5L, "alpha beta gamma delta")) // q 10000
      .toDF("doc_id", "text")
    // doc 1 must be q=2500: 4 tokens, all the SAME non-stopword
    val fixed = docs.withColumn("text",
      when(col("doc_id") === 1L, "zz zz zz zz").otherwise(col("text")))
    val out = TextStats.qualityTiers(fixed, tiers = 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    out.map(_._2) shouldBe Array(0L, 2500L, 5000L, 7500L, 8333L, 10000L)
    out.map(_._3) shouldBe Array(0L, 1L, 1L, 2L, 2L, 2L)
  }

  test("qualityTiers is total, partition-invariant, and its windows stay histogram-sized") {
    // vocab size varies 1..10 over a fixed 10 tokens → distinct-ratio
    // (and so quality) spans 10 values; a uniform fixture would be a
    // point mass where ties-land-high puts EVERY doc in the top tier
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 10).map(j => s"w${j % (1 + i % 10)}").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextStats.qualityTiers(docs, tiers = 4)
    out.count() shouldBe 200L // total: every doc gets a tier
    out.select("tier").distinct().as[Long].collect().toSet shouldBe Set(0L, 1L, 2L, 3L)
    val again = TextStats.qualityTiers(docs.repartition(7), tiers = 4)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    again shouldBe out.orderBy("doc_id").as[(Long, Long, Long)].collect()
    an[IllegalArgumentException] should be thrownBy TextStats.qualityTiers(docs, 1)
  }

  test("canonicalUrl normalizes case, www, default ports, query, fragment, slashes") {
    val urls = Seq(
      (1L, "https://WWW.Example.com:443/a/B/"),
      (2L, "https://example.com/a/B#frag"),
      (3L, "https://example.com/a/B?utm_source=x"),
      (4L, "http://example.com:80/a/B"),
      (5L, "http://example.com:8080/a/B"), // non-default port KEPT
      (6L, "https://example.com"),         // no path
      (7L, "not a url")).toDF("doc_id", "url")
    val out = urls.select(col("doc_id"), TextStats.canonicalUrl(col("url")))
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "https://example.com/a/B"
    out(2L) shouldBe "https://example.com/a/B"
    out(3L) shouldBe "https://example.com/a/B"
    out(4L) shouldBe "http://example.com/a/B" // path case preserved
    out(5L) shouldBe "http://example.com:8080/a/B"
    out(6L) shouldBe "https://example.com"
    out(7L) shouldBe ""
  }

  test("urlDedup keeps the min-id fetch per canonical page") {
    val docs = Seq(
      (10L, "https://www.x.com/p/"),
      (11L, "https://x.com/p#top"),
      (12L, "https://x.com/q")).toDF("doc_id", "url")
    val out = TextStats.urlDedup(docs).orderBy("keep_id")
      .as[(String, Long, Long)].collect()
    out shouldBe Array(
      ("https://x.com/p", 10L, 2L),
      ("https://x.com/q", 12L, 1L))
  }

  test("urlDedup never merges distinct non-parsing URLs") {
    // malformed rows canonicalize to '' — each must stay its OWN group
    // (one '' bucket would mark all but one of them duplicates)
    val docs = Seq(
      (1L, "relative/a"),
      (2L, "relative/b"),
      (3L, "https://x.com/p"),
      (4L, "http://x.com/p")).toDF("doc_id", "url") // different scheme: distinct pages
    val out = TextStats.urlDedup(docs).orderBy("keep_id")
      .as[(String, Long, Long)].collect()
    out shouldBe Array(
      ("", 1L, 1L),
      ("", 2L, 1L),
      ("https://x.com/p", 3L, 1L),
      ("http://x.com/p", 4L, 1L))
  }

  test("adaptiveLengthGate rejects a malformed band") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextStats.adaptiveLengthGate(docs, 0.8, 0.2)
    an[IllegalArgumentException] should be thrownBy
      TextStats.adaptiveLengthGate(docs, -0.1, 0.5)
  }

  // ----- bpeTrain -----------------------------------------------------

  test("bpeTrain learns the canonical Sennrich merge sequence") {
    // low×5 lower×2 newest×6 widest×3: (e,s)=9 ties (s,t)=9 → lexicographic
    // min wins; then (es,t)=9; then (l,o)=7 ties (o,w) → (l,o); then (lo,w)
    val text = (List.fill(5)("low") ++ List.fill(2)("lower") ++
      List.fill(6)("newest") ++ List.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextStats.bpeTrain(docs, numMerges = 4)
      .orderBy("rank")
      .select("rank", "left", "right", "pair_count")
      .as[(Long, String, String, Long)].collect()
    out shouldBe Array(
      (0L, "e", "s", 9L), (1L, "es", "t", 9L),
      (2L, "l", "o", 7L), (3L, "lo", "w", 7L))
  }

  test("bpeTrain stops below minPairCount and its vocab drives the apply side") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val m = TextStats.bpeTrain(docs, numMerges = 10) // (a,b)=2; (c,d)=1 < 2 → stop
    val merges = m.select("left", "right").as[(String, String)].collect()
    merges shouldBe Array(("a", "b"))
    val vocab = TextStats.bpeVocabOf(m)
    vocab shouldBe Seq("ab")
    // greedy apply: 'ab' = 1 token twice, 'cd' falls back to chars = 2
    docs.select(TextStats.bpeTokenCount(col("text"), vocab))
      .as[Long].head() shouldBe 4L
  }

  test("bpeTrain merges non-overlapping sites left-to-right") {
    // 'aaa': after taking the first (a,a), only ONE merge site exists —
    // a count that double-counted overlaps would merge differently
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = TextStats.bpeTrain(docs, numMerges = 2)
      .orderBy("rank").select("left", "right", "pair_count")
      .as[(String, String, Long)].collect()
    // round 1: (a,a) count 4 (two per 'aaa' by adjacent-pair counting);
    // merge leaves 'aa'+'a'; round 2: (aa,a) count 2
    out shouldBe Array(("a", "a", 4L), ("aa", "a", 2L))
  }

  test("bpeTrain greedy scan takes BOTH sites of contiguous disjoint repeats") {
    // The r12 ADVICE class: 'abab' must become [ab, ab] (i+=2 scan), not
    // [ab, a, b] (delimiter-sharing string replace) and not the
    // fixpoint over-merge ('aaaaaa' → [aa, aa, aa], never [aa, a, aa, a]).
    // This pins the llm_bpe_train_redup expectation: merges 2/3/4/7 are
    // reduplication merges, bit-matched by the DuckDB fold oracle.
    val plant = Seq(("abab", 50), ("aaaa", 40), ("aaaaaa", 30),
      ("ababab", 20), ("abcabc", 15), ("banana", 10), ("aab", 5),
      ("zq", 3), ("abababab", 7))
    val docs = plant.toDF("w", "n")
      .select(array_join(array_repeat(col("w"), col("n")), " ").as("text"))
    val out = TextStats.bpeTrain(docs, numMerges = 8)
      .orderBy("rank").select("rank", "left", "right", "pair_count")
      .as[(Long, String, String, Long)].collect()
    out shouldBe Array(
      (0L, "a", "a", 275L), (1L, "a", "b", 218L), (2L, "ab", "ab", 111L),
      (3L, "aa", "aa", 100L), (4L, "aaaa", "aa", 30L), (5L, "ab", "c", 30L),
      (6L, "a", "n", 20L), (7L, "abab", "ab", 20L))
  }

  test("bpeTrain is invariant under input partitioning and caps the vocab") {
    val docs = spark.range(120).select(col("id").as("doc_id"),
      concat(lit("w"), pmod(col("id"), lit(9)), lit("x y"),
        pmod(col("id"), lit(4))).as("text"))
    val a = TextStats.bpeTrain(docs, numMerges = 5)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
    val b = TextStats.bpeTrain(docs.repartition(7), numMerges = 5)
      .orderBy("rank").as[(Long, String, String, Long)].collect()
    b shouldBe a
    an[IllegalArgumentException] should be thrownBy
      TextStats.bpeTrain(docs, numMerges = 1, maxVocab = 2)
  }

  test("tokenizerFertility: scripts outside the vocab pay more tokens per char") {
    val vocab = Seq("tok", "en", "iz")
    val docs = Seq(
      ("en", "token token en"),      // vocab-covered: few tokens per char
      ("en", "tokenize en"),
      ("zh", "你好 世界"),            // no vocab hit: single-char fallback
      ("zh", "你好世界 你好"))
      .toDF("lang", "text")
    val out = TextStats.tokenizerFertility(docs, vocab)
      .select("lang", "docs", "fert_char_fp", "fert_word_fp")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    out("en")._2 shouldBe 2L
    out("zh")._2 shouldBe 2L
    // zh has zero vocab coverage → 1 token per non-space char (10000 fp
    // minus only the whitespace share); en amortizes multi-char pieces
    out("zh")._3 should be > out("en")._3
    // per-word fertility for zh = non-space chars per word ×1000 exactly
    out("zh")._4 shouldBe 2500L // 10 single-char tokens over 4 words
  }

  private val pplModel = TextStats.LmModel(
    unigrams = Seq("a" -> -100L, "b" -> -200L),
    bigrams = Seq(("a", "a", -50L)),
    backoffPenalty = -10L, oovPenalty = -1000L)

  test("pplBuckets cuts each language into exact discrete terciles") {
    // hand-computed ppl_ct: a·a transitions score -50, backoff paths
    // -110/-210, OOV -1000 → six distinct per-transition perplexities
    val docs = Seq(
      (1L, "xx", "a a a"), // ppl 50000  -> head
      (2L, "xx", "a b"),   // ppl 210000 -> tail
      (3L, "xx", "b a"),   // ppl 110000 -> head (c1 = rank-2 value)
      (4L, "xx", "a a b"), // ppl 130000 -> middle
      (5L, "xx", "b a b"), // ppl 160000 -> middle (c2 = rank-4 value)
      (6L, "xx", "a z"),   // ppl 1000000 -> tail
      (7L, "xx", "a"))     // <2 words: excluded
      .toDF("doc_id", "lang", "text")
    val out = TextStats.pplBuckets(docs, pplModel, quantum = 1L)
      .select("doc_id", "ppl_ct", "bucket")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
    out(1L) shouldBe (1L, 50000L, "head")
    out(3L) shouldBe (3L, 110000L, "head")
    out(4L) shouldBe (4L, 130000L, "middle")
    out(5L) shouldBe (5L, 160000L, "middle")
    out(2L) shouldBe (2L, 210000L, "tail")
    out(6L) shouldBe (6L, 1000000L, "tail")
  }

  test("pplBuckets cuts are per-language; a point-mass language is all head") {
    val docs = Seq(
      (1L, "aa", "a a a"), (2L, "aa", "b a"), (3L, "aa", "a b"),
      (4L, "bb", "a a"), (5L, "bb", "a a"), (6L, "bb", "a a"))
      .toDF("doc_id", "lang", "text")
    val out = TextStats.pplBuckets(docs, pplModel, quantum = 1L)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    out(1L) shouldBe "head"
    out(2L) shouldBe "middle"
    out(3L) shouldBe "tail"
    // lang bb is a single ppl value: the tercile cuts coincide and the
    // whole tie mass lands in the lower (better) bucket together
    Seq(4L, 5L, 6L).map(out) shouldBe Seq("head", "head", "head")
  }

  test("pplBuckets is invariant under input partitioning") {
    val docs = Seq(
      (1L, "aa", "a a a"), (2L, "aa", "b a"), (3L, "aa", "a b"),
      (4L, "aa", "a z"), (5L, "aa", "b a b"), (6L, "aa", "a a b"))
      .toDF("doc_id", "lang", "text")
    val once = TextStats.pplBuckets(docs, pplModel).collect().toSet
    val again = TextStats.pplBuckets(docs.repartition(5), pplModel)
      .collect().toSet
    again shouldBe once
  }

  test("tokenizerFertility sums are consistent and partition-invariant") {
    val vocab = Seq("ab", "cd")
    val docs = Seq(("en", "abcd ab"), ("de", "cdcd x"), ("en", "zz"))
      .toDF("lang", "text")
    val perDoc = docs.select(
        TextStats.bpeTokenCount(col("text"), vocab).as("n"))
      .as[Long].collect().sum
    val out = TextStats.tokenizerFertility(docs, vocab)
    out.agg(sum("bpe_tokens")).as[Long].head() shouldBe perDoc
    val again = TextStats.tokenizerFertility(docs.repartition(5), vocab)
      .collect().toSet
    again shouldBe out.collect().toSet
  }

  test("gopherRules: each planted defect fails exactly its own rule") {
    // Clean doc passes everything; each defect doc is built to fail ONE
    // rule (plus keep) and pass the rest — the per-rule failure mix is
    // the operator's point, so the isolation is what's asserted.
    val clean = (1 to 25).map(i => s"the fast word$i").mkString(" ")
    val docs = Seq(
      (0L, clean),
      // 8 bullet lines, 6 tokens each: words 48 ✓, alpha 40/48 ✓,
      // stop hits 16 ✓, mean (22 chars / 6 toks) ✓ — only bullet_ok ✗
      (1L, Seq.fill(8)("- the fast alpha beta gamma").mkString("\n")),
      // digit-only 2-char words: alpha 0 ✗ and mean 2.0 ✗ and stops 0 ✗
      (2L, (1 to 21).map(i => f"$i%02d").mkString(" ")),
      // 16-char gibberish words with 2 stopwords: only mean_len_ok ✗
      (3L, "the fast " + Seq.fill(23)("abcdefghijklmnop").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextStats.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) = out(id).getAs[Boolean](c)
    val ruleCols = Seq("words_ok", "mean_len_ok", "symbol_ok", "bullet_ok",
      "ellipsis_ok", "alpha_ok", "stop_ok")
    ruleCols.foreach(c => withClue(c) { b(0L, c) shouldBe true })
    b(0L, "keep") shouldBe true
    ruleCols.foreach(c => withClue(c) {
      b(1L, c) shouldBe (c != "bullet_ok") })
    b(1L, "keep") shouldBe false
    b(2L, "alpha_ok") shouldBe false
    b(2L, "mean_len_ok") shouldBe false
    b(2L, "stop_ok") shouldBe false
    b(2L, "words_ok") shouldBe true
    b(3L, "mean_len_ok") shouldBe false
    (ruleCols.toSet - "mean_len_ok").foreach(c => withClue(c) {
      b(3L, c) shouldBe true })
  }

  test("gopherRules symbol rule counts '#' and non-overlapping '...' runs") {
    // 10 words + 2 hashes + 1 ellipsis = 3 symbols / 12 tokens = 2500 bp
    // ('....' is ONE non-overlapping '...' occurrence, both engines'
    // left-to-right replace discipline); 1 word + 0 symbols passes.
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 end.... # #"),
      (1L, "plain the a words here all fine really good stuff"))
      .toDF("doc_id", "text")
    val out = TextStats.gopherRules(docs, minWords = 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("symbol_ok")).toMap
    out(0L) shouldBe false
    out(1L) shouldBe true
  }

  test("gopherRules ellipsis rule is a per-LINE fraction, not an occurrence count") {
    // 1 of 4 lines ends with '...' → 2500 bp ≤ 3000 passes even though
    // a '...' occurs; 2 of 4 → 5000 bp fails.
    val pass = (0L, "the fast one...\nplain the line\nanother a line\nlast fast line")
    val fail = (1L, "the fast one...\nsecond a line...\nanother the line\nlast fast line")
    val out = TextStats.gopherRules(Seq(pass, fail).toDF("doc_id", "text"),
        minWords = 1, maxSymbolBp = 10000).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("ellipsis_ok")).toMap
    out(0L) shouldBe true
    out(1L) shouldBe false
  }

  test("gopherMix rolls per-rule failures and kept tokens up by source") {
    val clean = (1 to 25).map(i => s"the fast word$i").mkString(" ")
    val docs = Seq(
      (1L, "s1", clean),                                    // keeps: 75 words
      (2L, "s1", (1 to 21).map(i => f"$i%02d").mkString(" ")), // alpha+mean+stop ✗
      (3L, "s2", Seq.fill(8)("- the fast alpha beta gamma").mkString("\n")))
      .toDF("doc_id", "source", "text")
    val out = TextStats.gopherMix(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    out("s1").getAs[Long]("n_docs") shouldBe 2L
    out("s1").getAs[Long]("f_alpha") shouldBe 1L
    out("s1").getAs[Long]("f_mean_len") shouldBe 1L
    out("s1").getAs[Long]("f_stop") shouldBe 1L
    out("s1").getAs[Long]("f_bullet") shouldBe 0L
    out("s1").getAs[Long]("n_keep") shouldBe 1L
    out("s1").getAs[Long]("kept_tokens") shouldBe 75L
    out("s2").getAs[Long]("f_bullet") shouldBe 1L
    out("s2").getAs[Long]("n_keep") shouldBe 0L
    out("s2").getAs[Long]("kept_tokens") shouldBe 0L
  }

  test("gopherRules carryCols threads extra columns through the projection") {
    val docs = Seq((1L, "s1", "the a b")).toDF("doc_id", "source", "text")
    val out = TextStats.gopherRules(docs, carryCols = Seq("source"))
    out.columns should contain("source")
    out.select("source").as[String].head() shouldBe "s1"
  }

  test("bm25 matches the hand-walked integer arithmetic and ranks tf up, length down") {
    // N=5, T=14, df(q)=2 → idf = l2(7) − l2(5) = 2816 − 2304 = 512.
    // doc1 (tf 1, dl 3): 512·1·44·14 // (20·14 + 6·14 + 18·3·5) = 497
    // doc2 (tf 2, dl 3): 512·2·44·14 // (560 + 84 + 270) = 690 — ranks first
    val docs = Seq((1L, "q w w"), (2L, "q q w"), (3L, "x y z"),
      (4L, "a b"), (5L, "c d e")).toDF("doc_id", "text")
    val out = TextStats.bm25(docs, Seq("q")).collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L, 1L)
    out.map(r => r.getLong(0) -> r.getAs[Long]("score_fp")).toMap shouldBe
      Map(2L -> 690L, 1L -> 497L)
    out.head.getAs[Long]("tf_q") shouldBe 2L
  }

  test("bm25 clamps common-term idf at zero and rejects duplicate terms") {
    // 'c' sits in 3 of 4 docs → negative Robertson idf → clamped → no
    // score, empty result (the Lucene-style floor, live on both sides)
    val docs = Seq((1L, "c x"), (2L, "c y"), (3L, "c z"), (4L, "w"))
      .toDF("doc_id", "text")
    TextStats.bm25(docs, Seq("c")).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      TextStats.bm25(docs, Seq("c", "c"))
    an[IllegalArgumentException] should be thrownBy
      TextStats.bm25(docs, Seq.empty)
  }

  test("repetitionRules: hand-walked dup-line / top-gram / dup-gram verdicts") {
    val dupLines = (Seq.fill(3)("the fast line one") :+ "unique a line two")
      .mkString("\n")
    val spam = Seq.fill(6)("buy now").mkString(" ") + " the a fast slow end here"
    val dupGram =
      "c1 c2 c3 c4 c5 the a c1 c2 c3 c4 c5 fast slow end here now www qqq zzz rrr"
    val docs = Seq(
      (0L, "plain the a words here all fine really good stuff"),
      (1L, dupLines), (2L, spam), (3L, dupGram)).toDF("doc_id", "text")
    val out = TextStats.repetitionRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) = out(id).getAs[Boolean](c)
    Seq("line_ok", "line_char_ok", "top_gram_ok", "dup_gram_ok", "keep")
      .foreach(c => withClue(c) { b(0L, c) shouldBe true })
    // 2 of 4 lines are copies → 5000 bp on both line rules
    out(1L).getAs[Long]("dup_line_bp") shouldBe 5000L
    out(1L).getAs[Long]("dup_line_char_bp") shouldBe 5000L
    b(1L, "line_ok") shouldBe false
    b(1L, "line_char_ok") shouldBe false
    // 'buy now' ×6, len 7 → mass 42 over 72 chars = 5833 bp
    out(2L).getAs[Long]("top_gram_bp") shouldBe 5833L
    b(2L, "top_gram_ok") shouldBe false
    // repeated 5-gram covers 10 of 21 positions = 4762 bp; its bigrams
    // tie at count 2 (mass 10/74 chars = 1351 bp) so ONLY dup_gram fails
    out(3L).getAs[Long]("dup_gram_bp") shouldBe 4762L
    out(3L).getAs[Long]("top_gram_bp") shouldBe 1351L
    b(3L, "dup_gram_ok") shouldBe false
    Seq("line_ok", "line_char_ok", "top_gram_ok")
      .foreach(c => withClue(c) { b(3L, c) shouldBe true })
    b(3L, "keep") shouldBe false
  }

  test("repetitionRules is one narrow kernel projection — no shuffle, no join") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = TextStats.repetitionRules(docs)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
  }

  test("gopherRules is one narrow projection — no shuffle, no join") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = TextStats.gopherRules(docs)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
  }

  test("phrases: word2phrase score exact, minCount filters before the discount") {
    // corpus (strays in their OWN docs so they add unigram mass without
    // new bigrams): 'x y' ×12 in one doc, 3 stray x, 2 stray y, 'p q'
    // ×9 (< minCount), 5 filler f.
    // N = 24 + 3 + 2 + 18 + 5 = 52; c(x)=15, c(y)=14
    // (x,y): c=12 → (12−5)·52·10⁴ div (15·14) = 3640000 div 210 = 17333
    // (y,x): c=11 (the reduplication seam) → 3120000 div 210 = 14857
    val docs = Seq(
      (1L, Seq.fill(12)("x y").mkString(" ")),
      (2L, "x x x"), (3L, "y y"),
      (4L, Seq.fill(9)("p q").mkString(" ")),
      (5L, "f f f f f")).toDF("doc_id", "text")
    val out = TextStats.phrases(docs, delta = 5L, minCount = 10L,
      minScoreFp = 1L).collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap
    m should have size 2
    m(("x", "y")) shouldBe ((12L, 17333L))
    m(("y", "x")) shouldBe ((11L, 14857L))
    // (p,q) count 9 < minCount → absent even though its score would pass
    m.keySet should not contain (("p", "q"))
    // threshold prunes: only the top pair survives 16000
    val cut = TextStats.phrases(docs, delta = 5L, minCount = 10L,
      minScoreFp = 16000L).collect()
    cut.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("x", "y"))
    // partitioning-invariant
    val again = TextStats.phrases(docs.repartition(7), delta = 5L,
      minCount = 10L, minScoreFp = 1L).collect()
    again.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq shouldBe
      out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
  }

  test("distinctNgrams: exact totals/distincts per order, short docs skip high orders") {
    // srcA: 'a b a b a' (5 toks) + 'a' (1 tok — yields NO bigrams);
    //   1-grams: 6 total {a×4, b×2} → 2 distinct
    //   2-grams: 4 total {ab×2, ba×2} → 2 distinct
    //   3-grams: 3 total {aba×2, bab} → 2 distinct
    // srcB: 'c' — 1-gram only; orders 2,3 have no rows for srcB.
    val docs = Seq(("srcA", "a b a b a"), ("srcA", "a"), ("srcB", "c"))
      .toDF("source", "text")
    val out = TextStats.distinctNgrams(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out should have size 4
    out(("srcA", 1L)) shouldBe ((6L, 2L, 3333L))
    out(("srcA", 2L)) shouldBe ((4L, 2L, 5000L))
    out(("srcA", 3L)) shouldBe ((3L, 2L, 6666L))
    out(("srcB", 1L)) shouldBe ((1L, 1L, 10000L))
    out.keySet should not contain (("srcB", 2L))
  }

  test("gramStream kernel == interpreted transform(slice/array_join) reference (r20)") {
    // r20 moved the gram walk onto the compiled WordShingles kernel;
    // this pins bit-identical gram multisets against the interpreted
    // HOF reference on the adversarial shapes: empty text, multi-space
    // runs (empty tokens survive a single-space split), docs shorter
    // than / exactly n tokens, repeated grams.
    val docs = Seq(
      ("s", ""), ("s", "a"), ("s", "a  b"), ("s", " a"), ("s", "a b c"),
      ("s", "a b"), ("t", "x y z x y z"), ("t", "  "), ("t", "q q q q"))
      .toDF("source", "text")
    val t = split(col("text"), " ")
    val ref = Seq(1, 2, 3).map { n =>
      val starts = when(org.apache.spark.sql.functions.size(t) >= n, sequence(lit(1), org.apache.spark.sql.functions.size(t) - (n - 1)))
        .otherwise(array().cast("array<int>"))
      transform(starts, i =>
        struct(lit(n).as("n"), array_join(slice(t, i, lit(n)), " ").as("gram")))
    }
    val reference = docs
      .select(col("source"), explode(concat(ref: _*)).as("g"))
      .select(col("source"), col("g.n").as("n"), col("g.gram").as("gram"))
      .groupBy("source", "n", "gram").count()
    val kernel = TextStats.distinctNgrams(docs)
    // compare through the operator's own first aggregation: join the
    // reference's per-gram counts against a kernel-path recount
    val kernelGrams = {
      // recompute the kernel gram stream exactly as gramStream does
      val arrays = Seq(1, 2, 3).map { n =>
        val sh = graft.functions.WordShingles(col("text"), n)
        val guarded = if (n == 1) sh
          else when(org.apache.spark.sql.functions.size(t) >= n, sh).otherwise(array().cast("array<string>"))
        transform(guarded, g => struct(lit(n).as("n"), g.as("gram")))
      }
      docs.select(col("source"), explode(concat(arrays: _*)).as("g"))
        .select(col("source"), col("g.n").as("n"), col("g.gram").as("gram"))
        .groupBy("source", "n", "gram").count()
    }
    val mismatches = reference
      .withColumnRenamed("count", "cRef")
      .join(kernelGrams.withColumnRenamed("count", "cKer"),
        Seq("source", "n", "gram"), "full_outer")
      .where(col("cRef").isNull || col("cKer").isNull ||
        col("cRef") =!= col("cKer"))
      .count()
    mismatches shouldBe 0L
    // and the operator's report stays the reference report
    val viaRef = reference.groupBy(col("source"), col("n"))
      .agg(sum(col("count")).as("tot"), count(lit(1)).as("dis"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    TextStats.distinctNgrams(docs).collect().foreach { r =>
      val k = (r.getString(0), r.getLong(1).toInt)
      (r.getLong(2), r.getLong(3)) shouldBe viaRef(k)
    }
  }

  test("distinctNgramsApprox: exact at small cardinality, ONE sketch-partial exchange") {
    // HLL is exact below its sparse-mode ceiling, so on a tiny corpus
    // the estimate must EQUAL the exact distinct count — any drift
    // here is a pipeline bug, not sketch error
    val docs = Seq(("srcA", "a b a b a"), ("srcA", "a"), ("srcB", "c"))
      .toDF("source", "text")
    val out = TextStats.distinctNgramsApprox(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    out should have size 4
    out(("srcA", 1L)) shouldBe ((6L, 2L))
    out(("srcA", 2L)) shouldBe ((4L, 2L))
    out(("srcA", 3L)) shouldBe ((3L, 2L))
    out(("srcB", 1L)) shouldBe ((1L, 1L))
    // the scale contract: NO corpus-sized (group, n, gram) exchange —
    // the only exchanges are the |groups|·|ns| sketch-partial shuffle
    // and the declared sort (range partitioning); spark.range input so
    // ConvertToLocalRelation can't fold the aggregation away
    val big = spark.range(200).select(
      concat(lit("s"), pmod(col("id"), lit(3))).as("source"),
      concat(lit("w"), pmod(col("id"), lit(7)), lit(" w"),
        pmod(col("id"), lit(5)), lit(" w"), pmod(col("id"), lit(11)))
        .as("text"))
    val plan = TextStats.distinctNgramsApprox(big)
      .queryExecution.executedPlan.toString
    "(?i)exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    // the audit face's estimate IS the sketch face's estimate — HLL is
    // duplicate-insensitive, so sketching the deduped gram rows builds
    // the bit-identical sketch (the one-exchange fold's load-bearing
    // property)
    val est = TextStats.distinctNgramsApprox(big).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val audit = TextStats.distinctNgramsAudit(big).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    audit.keySet shouldBe est.keySet
    audit.foreach { case (k, (exact, e)) =>
      e shouldBe est(k)
      exact should be > 0L
    }
  }

  test("backoffScore: level election and l2 contributions exact") {
    // train 'a b c a b c': c3 = {abc:2, bca:1, cab:1},
    // c2 = {ab:2, bc:2, ca:1}, c1 = {a:2, b:2, c:2}, N = 6
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c z"),   // (a,b,c) tri 2/ctx 2 → 0; (b,c,z) OOV z →
                         //   l2(1) − l2(7) = −2816
      (2L, "b c a b"),   // (b,c,a) 1/2 → −1024; (c,a,b) 1/1 → 0
      (3L, "c c a b"),   // (c,c,a) unseen tri, bigram ca 1 / c1(c) 2
                         //   → −1024 at lvl 2; (c,a,b) tri → 0
      (4L, "ab")         // < 3 tokens → no scored positions, no row
    ).toDF("doc_id", "text")
    val out = TextStats.backoffScore(train, score).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out should have size 3
    out(1L) shouldBe ((2L, 1L, 0L, 1L, -2816L))
    out(2L) shouldBe ((2L, 2L, 0L, 0L, -1024L))
    out(3L) shouldBe ((2L, 1L, 1L, 0L, -1024L))
  }

  test("backoffScore: size gate swaps broadcast for shuffle-hash, bit-identical") {
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c z"), (2L, "b c a b"), (3L, "c c a b"))
      .toDF("doc_id", "text")
    val viaBroadcast = TextStats.backoffScore(train, score).collect()
    val gated = TextStats.backoffScore(train, score, maxBroadcastRows = 0L)
    gated.collect() shouldBe viaBroadcast
    val plan = gated.queryExecution.executedPlan.toString
    plan should include("ShuffledHashJoin")
    // the 1-row total stays a broadcast NESTED-LOOP join; no count
    // table may broadcast-HASH-join once the gate trips
    plan should not include "BroadcastHashJoin"
  }

  test("backoffScore: minCount prunes only the trigram level") {
    // same corpus as the level-election test: c3 = {abc:2, bca:1,
    // cab:1} — minCount=2 keeps only abc, so bca/cab positions score
    // one level shallower while bigram/unigram denominators stay exact
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c z"), (2L, "b c a b"), (3L, "c c a b"))
      .toDF("doc_id", "text")
    val out = TextStats.backoffScore(train, score, minCount = 2L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out should have size 3
    // doc 1: (a,b,c) tri abc survives → 0; (b,c,z) OOV backstop −2816
    out(1L) shouldBe ((2L, 1L, 0L, 1L, -2816L))
    // doc 2: bca and cab both pruned → bigram ca 1/2 (−1024) + ab 2/2 (0)
    out(2L) shouldBe ((2L, 0L, 2L, 0L, -1024L))
    // doc 3: cca never seen, cab pruned → two level-2 positions
    out(3L) shouldBe ((2L, 0L, 2L, 0L, -1024L))
  }

  test("novelty: per-doc novel-gram counts exact, short docs emit no row, gate parity") {
    val train = Seq((0L, "a b c d")).toDF("doc_id", "text")
    // train trigrams: {a b c, b c d}
    val held = Seq(
      (1L, "a b c x"),   // {a b c}✓, {b c x}✗ → 1/2 novel = 5000
      (3L, "x y z"),     // {x y z}✗ → 10000
      (5L, "a b"))       // < 3 tokens → no row
      .toDF("doc_id", "text")
    val out = TextStats.novelty(train, held)
      .as[(Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq((1L, 2L, 1L, 5000L), (3L, 1L, 1L, 10000L))
    TextStats.novelty(train, held, maxBroadcastRows = 0L)
      .as[(Long, Long, Long, Long)].collect().toSeq shouldBe out
  }

  test("oovRate: membership flags exact, gate swaps to shuffle-hash bit-identically") {
    val held = Seq(("en", "a b zz"), ("en", "a qq"), ("de", "b b"))
      .toDF("lang", "text")
    val voc = Seq("a", "b").toDF("token")
    // en: 5 tokens, oov {zz, qq} = 2 → 4000 bp; de: 2 tokens, 0 oov
    val out = TextStats.oovRate(held, voc)
      .as[(String, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(("de", 2L, 0L, 0L), ("en", 5L, 2L, 4000L))
    val gated = TextStats.oovRate(held, voc, maxBroadcastRows = 0L)
    gated.as[(String, Long, Long, Long)].collect().toSeq shouldBe out
    gated.queryExecution.executedPlan.toString should
      include("ShuffledHashJoin")
  }

  test("psiDrift: hand-walked lanes, eps clamp, identical halves read zero") {
    // base: scores {500, 1500, 1500} → bins {0,1,1}; cur: {1500, 9999}
    // → bins {1, 9}. Lanes (l2 kit: l2(3333)=11906, l2(6667)=12930,
    // l2(5000)=12514, l2(1)=0):
    // bin 0: base 3333 bp / cur eps-clamp 1 → 3332·11906 = 39670792
    // bin 1: base 6667 / cur 5000 → 1667·416 = 693472
    // bin 9: base clamp 1 / cur 5000 → (−4999)·(−12514) = 62557486
    val rows = Seq((true, 500L), (true, 1500L), (true, 1500L),
      (false, 1500L), (false, 9999L)).toDF("b", "s")
    val out = TextStats.psiDrift(rows, col("b"), col("s")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out should have size 3
    out(0L) shouldBe ((1L, 0L, 3333L, 1L, 39670792L))
    out(1L) shouldBe ((2L, 1L, 6667L, 5000L, 693472L))
    out(9L) shouldBe ((0L, 1L, 1L, 5000L, 62557486L))
    // identical distributions → every psi lane is exactly zero
    val same = Seq((true, 800L), (false, 800L), (true, 4500L),
      (false, 4500L)).toDF("b", "s")
    TextStats.psiDrift(same, col("b"), col("s")).collect()
      .foreach(r => r.getLong(5) shouldBe 0L)
    an[IllegalArgumentException] should be thrownBy
      TextStats.psiDrift(rows, col("b"), col("s"), bins = 1)
  }

  test("phrases: size gate swaps broadcast for shuffle-hash, bit-identical") {
    val docs = (0 until 12).map(i => (i.toLong,
      "new york " + (if (i % 2 == 0) "city hall" else "state fair")))
      .toDF("doc_id", "text")
    val viaBroadcast = TextStats.phrases(docs, delta = 1L, minCount = 2L,
      minScoreFp = 1L).collect()
    val gated = TextStats.phrases(docs, delta = 1L, minCount = 2L,
      minScoreFp = 1L, maxBroadcastRows = 0L)
    gated.collect() shouldBe viaBroadcast
    val plan = gated.queryExecution.executedPlan.toString
    plan should include("ShuffledHashJoin")
    plan should not include "BroadcastHashJoin"
  }
}
