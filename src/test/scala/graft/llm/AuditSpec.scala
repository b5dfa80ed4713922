package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: all four statuses, content-not-id comparison,
  * partition invariance. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("outlinks: hosts extracted + case-folded, relative/malformed dropped, edges weighted") {
    val docs = Seq(
      (1L, "s1", """see <a href="http://A.Example.com/x">a</a> and
        |<a href="https://b.example.org/y?q=1#f">b</a> plus
        |<a href="/relative/only">r</a> and <a href="mailto:x@y">m</a>
        |again <a href="http://a.example.com/other">a2</a>""".stripMargin),
      (2L, "s2", "no links here"))
      .toDF("doc_id", "source", "text")
    val out = Audit.outlinks(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    out shouldBe Set(
      ("s1", "a.example.com", 2L),   // case-folded, path ignored, weighted
      ("s1", "b.example.org", 1L))   // query/fragment stripped
    // relative and scheme-without-authority (mailto:) hrefs never
    // produce an edge; a linkless source is absent entirely
    out.map(_._1) should not contain "s2"
  }

  test("corpusDiff labels added/removed/changed/unchanged by content hash") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Audit.corpusDiff(prev, next)
      .orderBy("doc_id").as[(Long, String)].collect()
    out shouldBe Array(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added"))
  }

  test("corpusDiff compares bytes, not formatting of the id") {
    // same id, same text → unchanged even when the frames differ in
    // column order / extra columns upstream of the projection
    val prev = Seq((7L, "same", "x")).toDF("doc_id", "text", "extra")
    val next = Seq((7L, "same")).toDF("doc_id", "text")
    Audit.corpusDiff(prev, next).select("status").as[String].head() shouldBe "unchanged"
  }

  test("corpusDiff does not conflate a NULL text with an absent id") {
    // sha2(NULL) is NULL: presence must come from id markers, and the
    // hash compare must be null-safe — a null-text row in both snapshots
    // is 'unchanged', one that gains text is 'changed', never 'added'
    val prev = Seq((1L, null: String), (2L, null: String), (3L, "t"))
      .toDF("doc_id", "text")
    val next = Seq((1L, null: String), (2L, "now present"), (3L, null: String))
      .toDF("doc_id", "text")
    Audit.corpusDiff(prev, next).orderBy("doc_id")
      .as[(Long, String)].collect() shouldBe Array(
      (1L, "unchanged"), (2L, "changed"), (3L, "changed"))
  }

  test("corpusDiff is invariant under input partitioning") {
    val prev = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("t"), col("id")).as("text"))
    // overlap ids 50-59 keep their text (unchanged); 60-99 wrap the
    // modulus (changed); 100-149 are added; prev's 0-49 are removed
    val next = spark.range(50, 150).select(col("id").as("doc_id"),
      concat(lit("t"), pmod(col("id"), lit(60))).as("text"))
    val a = Audit.corpusDiff(prev, next).orderBy("doc_id")
      .as[(Long, String)].collect()
    val b = Audit.corpusDiff(prev.repartition(7), next.repartition(3))
      .orderBy("doc_id").as[(Long, String)].collect()
    b shouldBe a
    // every status class must be represented for the fixture to mean anything
    a.map(_._2).toSet shouldBe Set("added", "removed", "changed", "unchanged")
  }

  // ----- sourceOverlap ------------------------------------------------

  test("sourceOverlap counts distinct shared contents once per unordered source pair") {
    val docs = Seq(
      ("s1", "alpha"), ("s2", "alpha"), // shared content → (s1,s2)
      ("s1", "alpha"), // same content AGAIN in s1 — must not double-count
      ("s1", "beta"), ("s2", "beta"), ("s3", "beta"), // 3 sources → 3 pairs
      ("s1", "gamma")) // single-source content → no pair at all
      .toDF("source", "text")
    val out = Audit.sourceOverlap(docs).orderBy("source_a", "source_b")
      .select("source_a", "source_b", "n_shared")
      .as[(String, String, Long)].collect()
    out shouldBe Array(
      ("s1", "s2", 2L), // alpha and beta
      ("s1", "s3", 1L), // beta
      ("s2", "s3", 1L))
  }

  test("sourceOverlap treats null text as absence, not as shared content") {
    // null-text rows in two sources must NOT read as a duplicate
    val docs = Seq(("s1", null), ("s2", null), ("s1", "x"), ("s2", "x"))
      .toDF("source", "text")
    Audit.sourceOverlap(docs).as[(String, String, Long)].collect() shouldBe
      Array(("s1", "s2", 1L))
  }

  test("sourceOverlap is invariant under input partitioning") {
    val docs = spark.range(200).select(
      concat(lit("s"), pmod(col("id"), lit(5))).as("source"),
      concat(lit("c"), pmod(col("id"), lit(13))).as("text"))
    val a = Audit.sourceOverlap(docs).orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect()
    val b = Audit.sourceOverlap(docs.repartition(7))
      .orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect()
    b shouldBe a
    a should not be empty // 13 contents × 5 sources: dense by construction
  }

  // ----- embeddingReport ----------------------------------------------

  test("embeddingReport names every defect slice with exact counts") {
    val emb = Seq[(Long, Array[Float])](
      (1L, Array(1.0f, 2.0f)), // clean
      (2L, Array(Float.NaN, 1.0f)), // NaN-poisoned
      (3L, Array(0.0f, 0.0f)), // zero-norm
      (4L, null), // absent
      (5L, Array(1.0f, 2.0f, 3.0f))) // wrong dims
      .toDF("vec_id", "embedding")
    val out = Audit.embeddingReport(emb).orderBy("dims")
      .select("dims", "n_vecs", "n_nan", "n_zero")
      .as[(Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (-1L, 1L, 0L, 0L),
      (2L, 3L, 1L, 1L),
      (3L, 1L, 0L, 0L))
  }

  test("embeddingReport: a NaN vector is not zero-norm; a healthy corpus is one row") {
    // NaN != 0 must keep the poisoned vector OUT of the zero count
    val emb = Seq[(Long, Array[Float])]((1L, Array(Float.NaN, 0.0f)))
      .toDF("vec_id", "embedding")
    Audit.embeddingReport(emb)
      .select("n_nan", "n_zero").as[(Long, Long)].head() shouldBe ((1L, 0L))
    val healthy = Seq[(Long, Array[Float])](
      (1L, Array(1.0f, 0.5f)), (2L, Array(0.1f, -0.2f)))
      .toDF("vec_id", "embedding")
    Audit.embeddingReport(healthy)
      .as[(Long, Long, Long, Long)].collect() shouldBe Array((2L, 2L, 0L, 0L))
  }

  // ----- dupProfile ---------------------------------------------------

  test("dupProfile hand-computed multiplicity histogram") {
    // contents: a×3, b×2, c×2, d×1 → (1,1,1), (2,2,4), (3,1,3)
    val docs = Seq("a", "a", "a", "b", "b", "c", "c", "d").toDF("text")
    val out = Audit.dupProfile(docs).orderBy("dup_count")
      .select("dup_count", "n_contents", "n_docs")
      .as[(Long, Long, Long)].collect()
    out shouldBe Array((1L, 1L, 1L), (2L, 2L, 4L), (3L, 1L, 3L))
  }

  test("dupProfile: null text is absence; a deduped corpus profiles flat") {
    val docs = Seq(Some("a"), Some("a"), None, Some("b")).toDF("text")
    Audit.dupProfile(docs).orderBy("dup_count")
      .as[(Long, Long, Long)].collect() shouldBe
      Array((1L, 1L, 1L), (2L, 1L, 2L))
    // post-exact-dedup idempotence: every content exactly once
    val deduped = Seq("a", "b", "c").toDF("text")
    Audit.dupProfile(deduped).as[(Long, Long, Long)].collect() shouldBe
      Array((1L, 3L, 3L))
  }

  // ----- corpusReport -------------------------------------------------

  test("shardManifest hand-computed counts, range, contiguity and checksum") {
    // charPolyHash("ab") = 97·31+98 = 3105; charPolyHash("a b") =
    // ((97·31+32)·31+98) = 94307; charPolyHash("") = 0
    val shards = Seq(
      (0L, 0L, "ab"), (0L, 1L, "a b"), (0L, 2L, ""),
      (1L, 0L, "ab"), (1L, 2L, "ab") // gap at pos 1 → not contiguous
    ).toDF("shard_id", "pos_in_shard", "text")
    val out = Audit.shardManifest(shards).orderBy("shard_id")
      .select("shard_id", "n_docs", "n_tokens", "first_pos", "last_pos",
        "checksum", "contiguous")
      .as[(Long, Long, Long, Long, Long, BigDecimal, Boolean)].collect()
    out(0) shouldBe ((0L, 3L, 4L, 0L, 2L, BigDecimal(3105L + 94307L), true))
    out(1) shouldBe ((1L, 2L, 2L, 0L, 2L, BigDecimal(2 * 3105L), false))
  }

  test("shardManifest: duplicate positions cannot spoof the contiguity flag") {
    // positions 0,0,2 span 3 = n_docs, but pos 0 is duplicated
    val shards = Seq((0L, 0L, "x"), (0L, 0L, "y"), (0L, 2L, "z"))
      .toDF("shard_id", "pos_in_shard", "text")
    Audit.shardManifest(shards).select("contiguous").as[Boolean].head() shouldBe false
  }

  test("shardManifest checksum is order-invariant and detects a content flip") {
    val base = (0 until 40).map(i =>
      (i.toLong / 8, (i % 8).toLong, s"doc number $i payload"))
      .toDF("shard_id", "pos_in_shard", "text")
    val a = Audit.shardManifest(base).orderBy("shard_id").collect()
    val b = Audit.shardManifest(base.orderBy(rand(7)).repartition(5))
      .orderBy("shard_id").collect()
    a shouldBe b
    val flipped = base.withColumn("text",
      when(col("shard_id") === 2 && col("pos_in_shard") === 3,
        lit("doc number XX payload")).otherwise(col("text")))
    val c = Audit.shardManifest(flipped).orderBy("shard_id").collect()
    assert(a(2) != c(2), "a flipped doc must change its shard's checksum")
    assert(a(0) == c(0) && a(4) == c(4), "other shards' manifests unchanged")
  }

  test("dupMass hand-computed: shared span mass is charged to the loser's group") {
    // k=3: docs 1 and 2 share a 4-token run "p q r s" (doc 1 wins the
    // min-(id, pos) election); doc 3 is clean. src a = {1, 3}, src b = {2}.
    val docs = Seq(
      (1L, "a", "p q r s x y"),      // 6 tokens, keeps all
      (2L, "b", "p q r s z"),        // 5 tokens, loses positions 1..4
      (3L, "a", "u v w")             // 3 tokens
    ).toDF("doc_id", "source", "text")
    val out = Audit.dupMass(docs, k = 3).orderBy("source")
      .select("source", "n_docs", "total_tokens", "kept_tokens", "removed_bp")
      .as[(String, Long, Long, Long, Long)].collect()
    out(0) shouldBe (("a", 2L, 9L, 9L, 0L))
    // b: windows of doc 2 at pos 1..3 — "p q r","q r s","r s z"; doc 1
    // has "p q r","q r s" (wins both) → doc 2 loses pos 1..4, keeps "z"
    out(1) shouldBe (("b", 1L, 5L, 1L, 8000L))
  }

  test("dupMass is flat on a span-free corpus and guards the group column") {
    val docs = Seq((1L, "a", "one two"), (2L, "a", "three four"))
      .toDF("doc_id", "source", "text")
    val out = Audit.dupMass(docs, k = 2)
      .select("removed_bp").as[Long].collect()
    out shouldBe Array(0L)
    an[IllegalArgumentException] should be thrownBy
      Audit.dupMass(docs.drop("source"), k = 2)
  }

  test("mixReport hand-computed: local shares vs global, absent stratum charges its global share") {
    // global: a=6, b=2 → a 7500bp, b 2500bp. shard 0 = 2a+2b: local a
    // 5000 (dev 2500), b 5000 (dev 2500) → max 2500. shard 1 = 4a:
    // local a 10000 (dev 2500), b ABSENT → dev = its global 2500.
    val laid = Seq(
      (0L, "a"), (0L, "a"), (0L, "b"), (0L, "b"),
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "a")
    ).zipWithIndex.map { case ((s, src), i) => (i.toLong, s, src) }
      .toDF("doc_id", "shard_id", "source")
    val out = Audit.mixReport(laid).orderBy("shard_id")
      .select("shard_id", "n_docs", "max_dev_bp")
      .as[(Long, Long, Long)].collect()
    out shouldBe Array((0L, 4L, 2500L), (1L, 4L, 2500L))
  }

  test("mixReport: a perfectly interleaved layout reads 0 everywhere") {
    val laid = (0 until 64).map(i => (i.toLong, (i / 8).toLong, s"s${i % 8}"))
      .toDF("doc_id", "shard_id", "source")
    Audit.mixReport(laid).select("max_dev_bp").as[Long].collect()
      .foreach(_ shouldBe 0L)
  }

  test("shardManifest requires the layout columns") {
    an[IllegalArgumentException] should be thrownBy
      Audit.shardManifest(Seq((1L, "t")).toDF("doc_id", "text"))
  }

  test("corpusReport hand-computed per-source datasheet") {
    val docs = Seq(
      ("s1", "en", "a b c"), // 3 tokens, 5 chars
      ("s1", "de", "d e"), // 2 tokens, 3 chars
      ("s2", "en", "f")) // 1 token, 1 char
      .toDF("source", "lang", "text")
    val out = Audit.corpusReport(docs).orderBy("source")
      .select("source", "n_docs", "total_tokens", "total_chars",
        "min_tokens", "max_tokens", "n_langs", "mean_tokens_centi")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    // s1 mean = 2.5 tokens → 250 centitokens exactly
    out shouldBe Array(
      ("s1", 2L, 5L, 8L, 2L, 3L, 2L, 250L),
      ("s2", 1L, 1L, 1L, 1L, 1L, 1L, 100L))
  }

  test("corpusReport mean is round-half-up, not truncation") {
    // 1 + 2 + 2 = 5 tokens over 3 docs = 1.666… → 167 centi, not 166
    val docs = Seq(("s", "en", "a"), ("s", "en", "b c"), ("s", "en", "d e"))
      .toDF("source", "lang", "text")
    Audit.corpusReport(docs).select("mean_tokens_centi")
      .as[Long].head() shouldBe 167L
  }

  test("corpusReport token override drives every token statistic") {
    val docs = Seq(("s1", "en", "ignored text", 10L), ("s1", "en", "x", 20L))
      .toDF("source", "lang", "text", "n")
    val out = Audit.corpusReport(docs, tokenCount = Some(col("n")))
      .select("total_tokens", "min_tokens", "max_tokens", "mean_tokens_centi")
      .as[(Long, Long, Long, Long)].head()
    out shouldBe ((30L, 10L, 20L, 1500L))
  }

  // (shard, n_docs, n_tokens, first, last, checksum, contiguous, batch)
  private def partials(rows: (Long, Long, Long, Long, Long, Long, Boolean, Long)*) =
    rows.toSeq
      .toDF("shard_id", "n_docs", "n_tokens", "first_pos", "last_pos",
        "checksum", "contiguous", "batch_id")
      .withColumn("checksum",
        col("checksum").cast(org.apache.spark.sql.types.DecimalType(38, 0)))

  test("mergeManifests folds adjacent slabs: sums, range, decimal checksum") {
    val merged = Audit.mergeManifests(partials(
        (0L, 3L, 30L, 0L, 2L, 100L, true, 0L),
        (0L, 2L, 25L, 3L, 4L, 40L, true, 1L),
        (1L, 5L, 55L, 0L, 4L, 77L, true, 1L)))
      .orderBy("shard_id")
      .withColumn("checksum", col("checksum").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
    merged shouldBe Array(
      (0L, 5L, 55L, 0L, 4L, 140L, true),
      (1L, 5L, 55L, 0L, 4L, 77L, true))
  }

  test("mergeManifests law: ANY slab partition in position order folds to the batch manifest") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random corpus size + random slab boundaries over the global
    // position order — every slabbing a slab-per-batch writer could
    // produce must fold to exactly the one-shot manifest
    val params = SCTest.Parameters.default.withMinSuccessfulTests(6)
    val gen = for {
      n <- Gen.choose(5, 40)
      rps <- Gen.choose(3, 9)
      cuts <- Gen.listOfN(3, Gen.choose(1, math.max(n - 1, 1)))
    } yield (n, rps.toLong, cuts.distinct.sorted)
    val prop = Prop.forAll(gen) { case (n, rps, cuts) =>
      val docs = (0 until n)
        .map(i => (i.toLong, s"doc body $i" + " x" * (i % 4)))
        .toDF("doc_id", "text")
      val layout = graft.llm.Packing.shuffleShards(docs, rps)
        .withColumn("__gpos",
          col("shard_id") * rps + col("pos_in_shard"))
        .localCheckpoint()
      val bounds = (0L +: cuts.map(_.toLong) :+ n.toLong).distinct.sorted
      val partials = bounds.zip(bounds.tail).zipWithIndex.map {
        case ((lo, hi), bi) =>
          Audit.shardManifest(
              layout.where(col("__gpos") >= lo && col("__gpos") < hi))
            .withColumn("batch_id", lit(bi.toLong))
      }.reduce(_ unionAll _)
      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = df
        .select("shard_id", "n_docs", "n_tokens", "first_pos", "last_pos",
          "checksum", "contiguous")
        .withColumn("checksum", col("checksum").cast("string"))
        .collect().map(_.toString).sorted.toSeq
      canon(Audit.mergeManifests(partials)) ==
        canon(Audit.shardManifest(layout.drop("__gpos")))
    }
    assert(SCTest.check(params, prop).passed, "manifest fold law failed")
  }

  test("mergeManifests re-proves contiguity: gap, overlap, and a bad partial all fail") {
    val merged = Audit.mergeManifests(partials(
        (0L, 3L, 30L, 0L, 2L, 1L, true, 0L), // gap: next starts at 4
        (0L, 2L, 25L, 4L, 5L, 1L, true, 1L),
        (1L, 3L, 30L, 0L, 2L, 1L, true, 0L), // overlap: next starts at 2
        (1L, 3L, 25L, 2L, 4L, 1L, true, 1L),
        (2L, 3L, 30L, 0L, 3L, 1L, false, 0L), // batch itself not contiguous
        (3L, 2L, 20L, 0L, 1L, 1L, true, 0L))) // single clean slab
      .orderBy("shard_id")
      .select("shard_id", "contiguous")
      .as[(Long, Boolean)].collect()
    merged shouldBe Array((0L, false), (1L, false), (2L, false), (3L, true))
  }

  test("hostRank: integer power rounds exact, dangling host leaks mass") {
    // 1→2, 3→2; host 2 dangles. n=3, r0 = 333333333333,
    // base = 50000000000.
    // iter1: share(1)=share(3)=85·r0//100=283333333333 → h2 =
    //   base + 2·283333333333 = 616666666666; h1 = h3 = base.
    // iter2+: shares from base = 42500000000 → h2 = 135000000000
    //   (h2's own mass LEAKS — the documented dangling variant).
    val edges = Seq((1L, 2L, 1L), (3L, 2L, 1L)).toDF("src", "dst", "c")
    val out = Audit.hostRank(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((1L, 1L, 50000000000L),
      (2L, 0L, 135000000000L), (3L, 1L, 50000000000L))
    // one round stops at the first power step
    Audit.hostRank(edges, iters = 1).collect()
      .map(r => r.getLong(2)).toSeq shouldBe
      Seq(50000000000L, 616666666666L, 50000000000L)
    an[IllegalArgumentException] should be thrownBy
      Audit.hostRank(edges, iters = 0)
    an[IllegalArgumentException] should be thrownBy
      Audit.hostRank(edges, maxHosts = 2)
  }
}
