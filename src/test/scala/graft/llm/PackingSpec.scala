package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-budget shard packing: hand-computed layout, per-stratum
  * independence, boundary-straddle rule, partition invariance. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packShards lays documents into budgeted shards by start offset") {
    // source a: tokens 3,4,5 → starts 0,3,7 → budget 5 → shards 0,0,1
    // source b: tokens 6,2   → starts 0,6   → shards 0,1 (own numbering)
    val docs = Seq(
      (0L, "a", "t t t"),
      (1L, "a", "t t t t"),
      (2L, "a", "t t t t t"),
      (3L, "b", "t t t t t t"),
      (4L, "b", "t t"))
      .toDF("doc_id", "source", "text")
    val out = Packing.packShards(docs, tokensPerShard = 5)
      .select("doc_id", "n_tokens", "shard_id", "offset_in_shard")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    out shouldBe Array(
      (0L, 3L, 0L, 0L),
      (1L, 4L, 0L, 3L),   // starts at 3, straddles into shard 1 — stays in 0
      (2L, 5L, 1L, 2L),
      (3L, 6L, 0L, 0L),   // b numbers its own shards from 0
      (4L, 2L, 1L, 1L))
  }

  test("packShards is invariant under input partitioning") {
    val docs = (0L until 200L)
      .map(i => (i, s"s${i % 4}", ("t " * (1 + (i % 7).toInt)).trim))
      .toDF("doc_id", "source", "text")
    val base = Packing.packShards(docs, 10)
      .select("doc_id", "shard_id", "offset_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    Packing.packShards(docs.repartition(11), 10)
      .select("doc_id", "shard_id", "offset_in_shard")
      .as[(Long, Long, Long)].collect().toSet shouldBe base
  }

  test("packShards rejects reserved output-column collisions") {
    val docs = Seq((0L, "a", "t", 9L)).toDF("doc_id", "source", "text", "shard_id")
    an[IllegalArgumentException] should be thrownBy
      Packing.packShards(docs, 5)
  }

  test("shuffleShards assigns the exact layout of the hash permutation") {
    // expectation computed INDEPENDENTLY: hash in BigInt space from the
    // mathematical definition, sort by (hash, id), positions 0..n-1,
    // shard arithmetic — any deviation in the implementation's order or
    // index base changes the layout.
    val ids = (0L until 23L) :+ (1L << 40) :+ 999999937L // a collision with id 0
    def h(id: Long): Long =
      ((BigInt(id) * BigInt(2654435761L)) mod BigInt(999999937L)).toLong
    val order = ids.sortBy(id => (h(id), id))
    val expect = order.zipWithIndex.map { case (id, p) =>
      (id, p.toLong / 7L, p.toLong % 7L)
    }.sortBy(_._1)
    // the fixture must separate hash order from id order, and exercise
    // the mod-P collision tiebreak (999999937 hashes like 0; id breaks it)
    order should not be ids.sorted
    h(999999937L) shouldBe h(0L)
    val out = Packing.shuffleShards(ids.toDF("doc_id"), rowsPerShard = 7L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    out.toSeq shouldBe expect
  }

  test("shuffleShards is a permutation: full shards, bijective positions, retry-stable") {
    val docs = spark.range(100).toDF("doc_id")
    val out = Packing.shuffleShards(docs, rowsPerShard = 8L)
    val layout = out.as[(Long, Long, Long)].collect()
    // bijection: 100 distinct (shard, pos) cells, shards 0..12 laid densely
    layout.map(r => (r._2, r._3)).toSet should have size 100
    val byShard = layout.groupBy(_._2).view.mapValues(_.length).toMap
    (0L until 12L).foreach(s => byShard(s) shouldBe 8)
    byShard(12L) shouldBe 4 // the tail shard holds the remainder
    // retry-stability: identical layout under a different partitioning
    Packing.shuffleShards(docs.repartition(13), rowsPerShard = 8L)
      .as[(Long, Long, Long)].collect().sortBy(_._1) shouldBe layout.sortBy(_._1)
  }

  test("shuffleShards epochs give distinct permutations; same epoch reproduces") {
    val docs = spark.range(200).toDF("doc_id")
    def layout(e: Int) = Packing.shuffleShards(docs, 16L, epoch = e)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val e0 = layout(0); val e1 = layout(1); val e2 = layout(2)
    e0 should not be e1
    e1 should not be e2
    e0 should not be e2
    layout(1) shouldBe e1 // same epoch → byte-identical layout
    // epoch 0 must be the unparameterized permutation (back-compat)
    Packing.shuffleShards(docs, 16L).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq shouldBe e0
    an[IllegalArgumentException] should be thrownBy
      Packing.shuffleShards(docs, 16L, epoch = -1)
  }

  test("interleave lays out a 2:1 local mixture and absorbs source exhaustion") {
    // expectation computed INDEPENDENTLY: rank docs per source by the
    // BigInt shuffle hash, slot rank r of source s at key
    // (r/w_s, sourceIndex, r%w_s), sort keys. Source 'a' has 6 docs at
    // weight 2, 'b' has 2 at weight 1 → cycles 0-1 read a,a,b; cycles
    // 2 on read only a (b exhausted); source 'z' is unlisted → dropped.
    val ids = Map("a" -> Seq(0L, 1L, 2L, 3L, 4L, 5L), "b" -> Seq(10L, 11L),
      "z" -> Seq(20L))
    val docs = ids.toSeq.flatMap { case (s, is) => is.map(i => (i, s)) }
      .toDF("doc_id", "source")
    def h(id: Long): Long =
      ((BigInt(id) * BigInt(2654435761L)) mod BigInt(999999937L)).toLong
    val weights = Map("a" -> 2, "b" -> 1)
    val keyed = for {
      (s, is) <- ids.toSeq if weights.contains(s)
      srcIdx = weights.keys.toSeq.sorted.indexOf(s)
      (id, r) <- is.sortBy(i => (h(i), i)).zipWithIndex
    } yield (id, s, (r / weights(s), srcIdx, r % weights(s)))
    val expect = keyed.sortBy(_._3).zipWithIndex
      .map { case ((id, s, _), pos) => (id, s, pos.toLong) }.sortBy(_._1)
    val out = Packing.interleave(docs, weights)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    out.toSeq shouldBe expect
    // the local mixture property itself: positions 0-5 hold cycles 0-1
    // as a,a,b,a,a,b
    val bySlot = out.sortBy(_._3).map(_._2).toSeq
    bySlot.take(6) shouldBe Seq("a", "a", "b", "a", "a", "b")
    bySlot.drop(6) shouldBe Seq("a", "a") // b exhausted, cycles shrink
    an[IllegalArgumentException] should be thrownBy
      Packing.interleave(docs, Map.empty[String, Int])
    an[IllegalArgumentException] should be thrownBy
      Packing.interleave(docs, Map("a" -> 0))
  }

  test("shuffleShards avoids the single-partition global window") {
    val plan = Packing.shuffleShards(spark.range(100).toDF("doc_id"), 10L)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }

  test("shuffleShards rejects bad shard sizes and reserved columns") {
    val docs = spark.range(10).toDF("doc_id")
    an[IllegalArgumentException] should be thrownBy
      Packing.shuffleShards(docs, 0L)
    an[IllegalArgumentException] should be thrownBy
      Packing.shuffleShards(docs.withColumn("shard_id", lit(1L)), 10L)
  }

  test("packSequences emits exact-size blocks with straddling docs sliced") {
    // one stratum, docs of 3/4/2 tokens, blocks of 4:
    // stream = a1 a2 a3 | b1 b2 b3 b4 | c1 c2 → blocks:
    //   0: a1 a2 a3 b1   1: b2 b3 b4 c1   2: c2
    val docs = Seq(
      (1L, "s", "a1 a2 a3"),
      (2L, "s", "b1 b2 b3 b4"),
      (3L, "s", "c1 c2")).toDF("doc_id", "source", "text")
    val out = Packing.packSequences(docs, blockTokens = 4L)
      .orderBy("block_id")
      .select("block_id", "block_text", "n_tokens")
      .as[(Long, String, Long)].collect()
    out shouldBe Array(
      (0L, "a1 a2 a3 b1", 4L),
      (1L, "b2 b3 b4 c1", 4L),
      (2L, "c2", 1L))
  }

  test("packSequences conserves every token, per stratum, in order") {
    val docs = Seq(
      (1L, "x", "p q r s t"),
      (2L, "x", "u v"),
      (1L, "y", "m n o")).toDF("doc_id", "source", "text")
    val blocks = Packing.packSequences(docs, blockTokens = 3L)
      .orderBy("source", "block_id")
      .select("source", "block_text").as[(String, String)].collect()
    blocks.filter(_._1 == "x").map(_._2).mkString(" ") shouldBe "p q r s t u v"
    blocks.filter(_._1 == "y").map(_._2).mkString(" ") shouldBe "m n o"
    // every block but each stratum's last is exactly full
    val sizes = Packing.packSequences(docs, 3L)
      .orderBy("source", "block_id")
      .select("source", "n_tokens").as[(String, Long)].collect()
    sizes.groupBy(_._1).values.foreach { s =>
      s.init.foreach(_._2 shouldBe 3L)
    }
  }

  test("packSequences layout is invariant under input partitioning") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("s"), pmod(col("id"), lit(3))).as("source"),
      concat_ws(" ", lit("w1 w2 w3"), col("id").cast("string")).as("text"))
    val base = Packing.packSequences(docs, 7L)
      .select("source", "block_id", "block_text")
      .as[(String, Long, String)].collect().toSet
    Packing.packSequences(docs.repartition(13), 7L)
      .select("source", "block_id", "block_text")
      .as[(String, Long, String)].collect().toSet shouldBe base
  }

  test("packSequences rejects a non-positive block size") {
    val docs = Seq((0L, "s", "t")).toDF("doc_id", "source", "text")
    an[IllegalArgumentException] should be thrownBy
      Packing.packSequences(docs, 0L)
  }

  test("packSequences rejects reserved output-column collisions") {
    val docs = Seq((0L, "s", "t", 1L)).toDF("doc_id", "source", "text", "block_id")
    an[IllegalArgumentException] should be thrownBy
      Packing.packSequences(docs, 4L)
  }

  // ----- packSpans ----------------------------------------------------

  test("packSpans hand-computed span layout") {
    // docs of 5, 10, 17 tokens in one stratum; 8-token blocks
    val docs = Seq(
      ("s", 1L, (1 to 5).map(i => s"w$i").mkString(" ")),
      ("s", 2L, (1 to 10).map(i => s"w$i").mkString(" ")),
      ("s", 3L, (1 to 17).map(i => s"w$i").mkString(" ")))
      .toDF("source", "doc_id", "text")
    val out = Packing.packSpans(docs, 8L)
      .orderBy("block_id", "span_start")
      .select("source", "block_id", "doc_id", "span_start", "span_len")
      .as[(String, Long, Long, Long, Long)].collect()
    out shouldBe Array(
      ("s", 0L, 1L, 0L, 5L), ("s", 0L, 2L, 5L, 3L),
      ("s", 1L, 2L, 0L, 7L), ("s", 1L, 3L, 7L, 1L),
      ("s", 2L, 3L, 0L, 8L), ("s", 3L, 3L, 0L, 8L))
  }

  test("packSpans partitions every packSequences block exactly") {
    // spans and packed blocks from the SAME inputs must agree: per
    // (stratum, block) the span lengths sum to the block's n_tokens,
    // spans tile the block contiguously from 0, and every doc's spans
    // sum to its token count
    val docs = spark.range(80).select(
      concat(lit("s"), pmod(col("id"), lit(3))).as("source"),
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), pmod(col("id") * 13, lit(29)) + 1),
        i => concat(lit("t"), i)), " ").as("text"))
    val blocks = Packing.packSequences(docs, 32L)
      .select("source", "block_id", "n_tokens")
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val spans = Packing.packSpans(docs, 32L)
      .select("source", "block_id", "doc_id", "span_start", "span_len")
      .as[(String, Long, Long, Long, Long)].collect()
    val byBlock = spans.groupBy(s => (s._1, s._2))
    byBlock.keySet shouldBe blocks.keySet
    byBlock.foreach { case (k, ss) =>
      ss.map(_._5).sum shouldBe blocks(k)
      val sorted = ss.sortBy(_._4)
      sorted.head._4 shouldBe 0L
      sorted.sliding(2).foreach {
        case Array(a, b) => b._4 shouldBe (a._4 + a._5)
        case _ => ()
      }
    }
    val nt = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(split(col("text"), " "))
        .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    spans.groupBy(_._3).foreach { case (d, ss) =>
      assert(ss.map(_._5).sum == nt(d))
    }
  }

  test("packSpans zero-token docs occupy no span (tokenCount override)") {
    val docs = Seq(("s", 1L, "x", 0L), ("s", 2L, "x", 5L))
      .toDF("source", "doc_id", "text", "n")
    val out = Packing.packSpans(docs, 8L, tokenCount = Some(col("n")))
      .select("doc_id").as[Long].collect()
    out shouldBe Array(2L)
  }

  test("packSpans layout is invariant under input partitioning") {
    val docs = spark.range(60).select(lit("s").as("source"),
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), pmod(col("id"), lit(7)) + 1),
        i => concat(lit("t"), i)), " ").as("text"))
    val a = Packing.packSpans(docs, 16L)
      .orderBy("block_id", "span_start")
      .as[(String, Long, Long, Long, Long)].collect()
    val b = Packing.packSpans(docs.repartition(7), 16L)
      .orderBy("block_id", "span_start")
      .as[(String, Long, Long, Long, Long)].collect()
    b shouldBe a
  }

  test("packSpans rejects bad block sizes and reserved columns") {
    val docs = Seq(("s", 1L, "a b")).toDF("source", "doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Packing.packSpans(docs, 0L)
    an[IllegalArgumentException] should be thrownBy
      Packing.packSpans(docs.withColumn("span_len", lit(1L)), 8L)
  }

  // ----- paddingSweep -------------------------------------------------

  test("lengthBatches hand-computed: length-sorted 2-doc batches, round-half-up waste") {
    // lengths: d1=1, d2=3, d3=3, d4=5 (one source). batchSize 2, sorted
    // by (nt, id): batch 0 = (d1:1, d2:3) max 3 real 4 padded 6 →
    // waste = rhu(2/6·10⁴) = (2·20000+6)//12 = 3333 bp; batch 1 =
    // (d3:3, d4:5) max 5 real 8 padded 10 → (2·20000+10)//20 = 2000 bp
    val docs = Seq(
      (1L, "s", "a"), (2L, "s", "a b c"), (3L, "s", "d e f"),
      (4L, "s", "a b c d e")).toDF("doc_id", "source", "text")
    val out = Packing.lengthBatches(docs, batchSize = 2)
      .orderBy("batch_id")
      .select("source", "batch_id", "n_docs", "max_tokens", "real_tokens", "waste_bp")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    out shouldBe Array(
      ("s", 0L, 2L, 3L, 4L, 3333L),
      ("s", 1L, 2L, 5L, 8L, 2000L))
  }

  test("lengthBatches: batch 0 is the shortest; strata batch independently; invariant under partitioning") {
    val docs = (0 until 50).map { i =>
      val src = if (i % 2 == 0) "a" else "b"
      (i.toLong, src, Seq.fill(1 + (i * 7) % 23)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Packing.lengthBatches(docs, batchSize = 8)
    val perBatch = out.orderBy("source", "batch_id")
      .select("source", "batch_id", "max_tokens").as[(String, Long, Long)].collect()
    // within each source, max_tokens is non-decreasing in batch_id
    perBatch.groupBy(_._1).values.foreach { rows =>
      val ms = rows.sortBy(_._2).map(_._3)
      ms.zip(ms.tail).foreach { case (a, b) => assert(a <= b) }
    }
    val again = Packing.lengthBatches(docs.repartition(9), batchSize = 8)
      .orderBy("source", "batch_id").collect()
    out.orderBy("source", "batch_id").collect() shouldBe again
  }

  test("lengthBatches: all-empty batch has waste 0; rejects bad sizes and reserved columns") {
    val docs = Seq((1L, "s", ""), (2L, "s", "")).toDF("doc_id", "source", "text")
    // "" splits to one zero-length token under WsRun → nt=1; force nt=0
    // via the tokenCount override to exercise the padded=0 branch
    val out = Packing.lengthBatches(docs, 4, tokenCount = Some(lit(0L)))
      .select("waste_bp").as[Long].collect()
    out shouldBe Array(0L)
    an[IllegalArgumentException] should be thrownBy Packing.lengthBatches(docs, 0)
    an[IllegalArgumentException] should be thrownBy
      Packing.lengthBatches(docs.withColumn("batch_id", lit(1)), 4)
  }

  test("paddingSweep hand-computed blocks and round-half-up waste") {
    // docs of exactly 5, 10, 17 whitespace tokens
    val docs = Seq(
      (1L, (1 to 5).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 17).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Packing.paddingSweep(docs, Seq(8L, 16L))
      .orderBy("block_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    // C=8: blocks 1+2+3=6, padded 48, real 32, waste 16/48 → 3333 bp
    // C=16: blocks 1+1+2=4, padded 64, real 32, waste 32/64 → 5000 bp
    out shouldBe Array(
      (8L, 6L, 32L, 48L, 3333L),
      (16L, 4L, 32L, 64L, 5000L))
  }

  test("paddingSweep zero-token docs occupy zero blocks (tokenCount override)") {
    val docs = Seq((1L, "ignored", 0L), (2L, "ignored", 7L))
      .toDF("doc_id", "text", "n")
    val out = Packing.paddingSweep(docs, Seq(4L), tokenCount = Some(col("n")))
      .as[(Long, Long, Long, Long, Long)].collect()
    // only doc 2 contributes: ceil(7/4)=2 blocks, padded 8, waste 1/8 → 1250
    out shouldBe Array((4L, 2L, 7L, 8L, 1250L))
  }

  test("paddingSweep one scan regardless of candidate count") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Packing.paddingSweep(docs, (1L to 12L).toSeq)
      .queryExecution.executedPlan.toString
    // conditional aggregates over one shared projection — no join of
    // per-candidate subplans
    plan should not include "Join"
  }

  test("paddingSweep rejects malformed candidate lists") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Packing.paddingSweep(docs, Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Packing.paddingSweep(docs, Seq(0L))
    an[IllegalArgumentException] should be thrownBy
      Packing.paddingSweep(docs, Seq(8L, 8L))
  }

  test("spanCorruption matches the hand-walked layout (counts, lengths, placement)") {
    // n=10: mask round(1.5)=2, spans round(2/3)=1, stride 10, jitter
    // room 8, h=(1·1000003+7) mod p =1000010 → off 2 → span "2:2".
    // n=40 (id 2): mask 6, spans 2, stride 20, len 3, room 17;
    // h0=2000013 → off 14; h1=2000044 → off 11 → "14:3;31:3".
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.spanCorruption(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getLong(1) shouldBe 10L           // n_tokens
    out(1L).getLong(2) shouldBe 2L            // n_mask
    out(1L).getLong(3) shouldBe 1L            // n_spans
    out(1L).getLong(4) shouldBe 9L            // input_len = 10-2+1
    out(1L).getLong(5) shouldBe 4L            // target_len = 2+1+1
    out(1L).getString(6) shouldBe "2:2"
    out(2L).getLong(2) shouldBe 6L
    out(2L).getLong(3) shouldBe 2L
    out(2L).getString(6) shouldBe "14:3;31:3"
  }

  test("spanCorruption spans are in-range, non-overlapping, and sum to n_mask") {
    val docs = (1L to 60L).map(i =>
        (i, (1 to (10 + (i % 45)).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    Packing.spanCorruption(docs, noiseBp = 2500, meanSpan = 2).collect()
      .foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        val spans = r.getAs[String]("spans").split(";").toSeq
          .map { s => val Array(a, b) = s.split(":"); (a.toLong, b.toLong) }
        spans.map(_._2).sum shouldBe r.getAs[Long]("n_mask")
        spans.foreach { case (s, l) => s should be >= 0L; (s + l) should be <= n }
        spans.sliding(2).foreach {
          case Seq((s1, l1), (s2, _)) => (s1 + l1) should be <= s2
          case _ =>
        }
      }
  }

  test("spanCorruption is deterministic under repartitioning and guards its params") {
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    Packing.spanCorruption(docs.repartition(5)).collect() shouldBe
      Packing.spanCorruption(docs).collect()
    an[IllegalArgumentException] should be thrownBy
      Packing.spanCorruption(docs, noiseBp = 0)
    an[IllegalArgumentException] should be thrownBy
      Packing.spanCorruption(docs, noiseBp = 6000)
    an[IllegalArgumentException] should be thrownBy
      Packing.spanCorruption(docs, meanSpan = 0)
  }

  test("chatPack: offsets, mask spans and ragged conversations exact") {
    // rows deliberately scrambled — assembly order must come from the
    // turn column, not arrival order
    val turns = Seq(
      (1L, 2L, "assistant", "ok"),
      (2L, 0L, "user", "solo"),
      (1L, 0L, "system", "hi"),
      (3L, 1L, "assistant", "yz"),
      (1L, 1L, "user", "ab c"),
      (3L, 0L, "assistant", "x")
    ).toDF("conv_id", "turn", "role", "content")
    val out = Packing.chatPack(turns).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5)))).toMap
    out should have size 3
    // conv 1: segs 12 + 12 + 15 chars; assistant content at 24+13
    out(1L) shouldBe ((3L, "<|system|>hi<|user|>ab c<|assistant|>ok",
      "37:2", 2L, 39L))
    // conv 2: no assistant turn → empty span string, zero mass
    out(2L) shouldBe ((1L, "<|user|>solo", "", 0L, 12L))
    // conv 3: two assistant turns → two spans in turn order
    out(3L) shouldBe ((2L, "<|assistant|>x<|assistant|>yz",
      "13:1;27:2", 3L, 29L))
    // partitioning-invariant
    Packing.chatPack(turns.repartition(5)).collect().map(_.toSeq) shouldBe
      Packing.chatPack(turns).collect().map(_.toSeq)
  }

  test("fim: PSM reassembly and the three empty-segment branches exact") {
    // selection hash (id·9301+49297) % 10000 < 5000: ids 7/8/9 → fim,
    // id 1 (8598) → plain; cut hashes land a=b=2 for id 7 (empty
    // middle), a=0 for id 8 (empty prefix), a=b=1 of n=2 for id 9
    val docs = Seq(
      (1L, "z1 z2 z3"),
      (7L, "w1 w2 w3 w4 w5"),
      (8L, "x1 x2 x3 x4"),
      (9L, "y1 y2")).toDF("doc_id", "text")
    val out = Packing.fim(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    out(1L) shouldBe (("plain", 0L, 3L, 0L, "z1 z2 z3"))
    out(7L) shouldBe (("fim", 2L, 0L, 3L, "<PRE>w1 w2<SUF>w3 w4 w5<MID>"))
    out(8L) shouldBe (("fim", 0L, 1L, 3L, "<PRE><SUF>x2 x3 x4<MID>x1"))
    out(9L) shouldBe (("fim", 1L, 0L, 1L, "<PRE>y1<SUF>y2<MID>"))
    // rate 0 → everything passes through
    Packing.fim(docs, fimRate = 0).collect()
      .map(_.getString(1)).toSet shouldBe Set("plain")
    an[IllegalArgumentException] should be thrownBy
      Packing.fim(docs, fimRate = 10001)
  }
}
