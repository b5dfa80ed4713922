package graft.llm

import graft.functions.VectorFunctions.intDiv
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing — the step between curation and training
  * that lays documents out into fixed-token-budget shards (sequence
  * packing / tokenizer-sharding both start from it): within each stratum,
  * documents are concatenated in a stable order and a document belongs to
  * the shard where its START offset falls. Pure arithmetic on a running
  * token sum, so the layout is deterministic, retry-stable, and
  * ANSI-SQL-expressible (oracle-gated end-to-end).
  *
  * 100 TB notes: the running sum is a window partitioned by
  * `partitionCols` — strata process in parallel, and WITHIN a stratum
  * Spark range-partitions the sort, but the prefix sum still serializes
  * per stratum. Size strata accordingly: pack per (source, dt-bucket)
  * rather than per source when one stratum is a double-digit share of
  * the corpus — shard ids are per-stratum anyway, so a finer grain only
  * adds a column to the shard key. (The alternative — a two-phase
  * per-partition presum + driver offset scan — saves nothing once strata
  * are sized right, and loses the declarative plan.)
  */
object Packing {

  /** Assign each document `n_tokens`, `shard_id` and `offset_in_shard`
    * (token offset of the document inside its shard). Shards are
    * per-stratum: shard k covers stratum token offsets
    * [k·budget, (k+1)·budget); a document straddling the boundary counts
    * toward the shard where it starts — shards overflow by at most one
    * document rather than splitting one (the downstream tokenizer packs
    * the remainder). Integer arithmetic throughout.
    *
    * PRECONDITION: `orderCol` must be UNIQUE within each stratum (e.g. a
    * doc_id) — the running sum and the block reassembly in
    * [[packSequences]] order by it alone, so ties would make `__start`
    * and the block layout partition-order-dependent. Not guarded (a
    * distributed uniqueness check is a full shuffle); violating it costs
    * determinism, not correctness of token counts.
    *
    * `tokenCount` overrides the budget metric (default: [[TextStats.WsRun]]
    * run count) — pass [[TextStats.bpeTokenCount]] for subword-faithful
    * budgets; the expression must be evaluable against `docs`' columns. */
  def packShards(docs: DataFrame, tokensPerShard: Long,
                 partitionCols: Seq[String] = Seq("source"),
                 orderCol: String = "doc_id",
                 textCol: String = "text",
                 tokenCount: Option[Column] = None): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    require(!docs.columns.exists(Seq("n_tokens", "shard_id", "offset_in_shard").contains),
      "packShards writes n_tokens/shard_id/offset_in_shard; input already has one — rename it first")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens",
        tokenCount.getOrElse(size(split(col(textCol), TextStats.WsRun)).cast("long")))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard_id", intDiv(col("__start"), lit(tokensPerShard)))
      .withColumn("offset_in_shard",
        col("__start") - col("shard_id") * tokensPerShard)
      .drop("__start")
  }

  /** The shuffle-order lattice shared by [[shuffleShards]]: the same
    * multiplicative construction as [[Sampling.latticeResidue]] but over
    * the prime modulus 999999937 (with 2654435761 ≡ 654435887 reduced mod
    * it), so the order is a fine-grained pseudo-permutation of the id
    * space rather than 10⁴ coarse residue classes. Largest intermediate
    * 999999936·654435887 < 2⁶⁰ — ANSI-overflow-free at any id, and
    * replayable in any SQL engine. Ids congruent mod 10⁹ collide;
    * ordering ties break on the id itself, so the layout stays total and
    * deterministic. */
  val ShuffleModulus = 999999937L
  private val shuffleMultiplier = 654435887L

  /** `epoch` re-keys the permutation for multi-epoch training — the
    * multiplier becomes M^(epoch+1) mod P (computed driver-side, so the
    * per-row expression stays one multiply+mod and any epoch's order is
    * replayable in plain SQL from its literal multiplier). Distinct
    * epochs give distinct permutations unless ord(M) divides their
    * difference — ord(M) divides P−1 ≈ 10⁹ and is astronomically larger
    * than any epoch count in practice (spec pins epochs 0–2 pairwise
    * distinct). */
  def shuffleHash(id: Column, epoch: Int = 0): Column = {
    require(epoch >= 0, "epoch must be non-negative")
    val m = BigInt(shuffleMultiplier)
      .modPow(BigInt(epoch + 1), BigInt(ShuffleModulus)).toLong
    pmod(pmod(id.cast("long"), lit(ShuffleModulus)) * m, lit(ShuffleModulus))
  }

  /** Deterministic global corpus shuffle + shard layout — the "shuffle
    * the corpus before training" step: every row gets a global position
    * under [[shuffleHash]] order (a seed-free pseudo-random permutation —
    * id order would feed the model each crawl/source in sequence) and a
    * `(shard_id, pos_in_shard)` layout of `rowsPerShard` rows per shard.
    * No RNG: the permutation is a pure function of the ids, so it is
    * identical across runs, retries and cluster sizes — a training run
    * can be resumed or re-sharded byte-for-byte; pass `epoch` for a
    * fresh deterministic order each training epoch.
    *
    * Plan shape (100 TB): a global permutation is the ONE genuinely
    * global operation in training prep and costs exactly one exchange —
    * `repartitionByRange` on the hash (range bounds come from Spark's
    * sampling; the lattice's uniformity keeps them balanced), sort
    * within partitions, then [[graft.core.Positional]]'s two-pass offset
    * index (per-partition counts + narrow add — NO single-partition
    * window). Shard arithmetic is a narrow projection; shard files write
    * out partition-local. */
  def shuffleShards(df: DataFrame, rowsPerShard: Long,
                    idCol: String = "doc_id", epoch: Int = 0): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    require(!df.columns.exists(Seq("shard_id", "pos_in_shard").contains),
      "shuffleShards writes shard_id/pos_in_shard; input already has one — rename it first")
    val indexed = graft.core.Positional.zipWithIndex(df,
      Seq(shuffleHash(col(idCol), epoch), col(idCol)), "__pos")
    indexed.select(df.columns.map(col) ++ Seq(
      intDiv(col("__pos"), lit(rowsPerShard)).as("shard_id"),
      (col("__pos") - intDiv(col("__pos"), lit(rowsPerShard)) * rowsPerShard)
        .as("pos_in_shard")): _*)
  }

  /** Deterministic weighted source interleaving — where [[shuffleShards]]
    * randomizes the training order globally, interleave guarantees the
    * LOCAL mixture: with weights web=2, code=1, every consecutive
    * 3-document window reads web, web, code — the "curriculum mixing at
    * batch granularity" training-order layout, with no RNG anywhere.
    * Each source's documents are ranked in [[shuffleHash]] order, and
    * rank `r` of source `s` (weight `w_s`) lands in round-robin cycle
    * `r div w_s` at slot `(source order, r mod w_s)` — a source that
    * exhausts early simply stops contributing and later cycles shrink.
    * Sources not in `weights` are DROPPED ([[Sampling.mixture]]'s
    * unlisted-stratum discipline). Output adds `interleave_pos`, the
    * 0-based global training position.
    *
    * Plan shape (100 TB): the per-source rank is a row_number window —
    * [[Packing]]'s per-stratum serialization rule applies verbatim
    * (interleave per (source, dt-bucket) when one source dominates);
    * the global cycle order then costs ONE range-sort exchange + the
    * two-pass offset index, exactly [[shuffleShards]]'s tail. */
  def interleave(df: DataFrame, weights: Map[String, Int],
                 sourceCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty, "interleave needs at least one source weight")
    require(weights.values.forall(_ > 0), "interleave weights must be positive")
    require(!df.columns.contains("interleave_pos"),
      "interleave writes 'interleave_pos'; input already has it — rename it first")
    val srcOrder = weights.keys.toSeq.sorted
    val wCol = srcOrder.foldLeft(lit(-1L)) { (acc, s) =>
      when(col(sourceCol) === s, lit(weights(s).toLong)).otherwise(acc)
    }
    val prio = srcOrder.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(sourceCol) === s, lit(i)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(shuffleHash(col(idCol)), col(idCol))
    val ranked = df.where(col(sourceCol).isin(srcOrder: _*))
      .withColumn("__r", row_number().over(w).cast("long") - 1L)
      .withColumn("__c", intDiv(col("__r"), wCol))
      .withColumn("__p", prio)
      .withColumn("__o", pmod(col("__r"), wCol))
    graft.core.Positional
      .zipWithIndex(ranked, Seq(col("__c"), col("__p"), col("__o")), "interleave_pos")
      .drop("__r", "__c", "__p", "__o")
  }

  /** Shard layout from ANY global position column — the bridge between
    * an ordering operator that emits a position ([[interleave]]'s
    * `interleave_pos`, a stored layout) and the shard-addressed world of
    * [[graft.sources.Sinks.trainingShards]]: `shard_id = pos div
    * rowsPerShard`, `pos_in_shard = pos mod rowsPerShard` — one narrow
    * projection. ([[shuffleShards]] fuses this arithmetic with its own
    * index; use shardByPos when the position already exists.) */
  def shardByPos(df: DataFrame, rowsPerShard: Long,
                 posCol: String = "interleave_pos"): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    require(df.columns.contains(posCol),
      s"shardByPos needs the position column '$posCol'")
    require(!df.columns.exists(Seq("shard_id", "pos_in_shard").contains),
      "shardByPos writes shard_id/pos_in_shard; input already has one — rename it first")
    df.withColumn("shard_id", intDiv(col(posCol), lit(rowsPerShard)))
      .withColumn("pos_in_shard",
        col(posCol) - intDiv(col(posCol), lit(rowsPerShard)) * rowsPerShard)
  }

  /** TRUE sequence packing — where [[packShards]] assigns whole documents
    * to the shard their start falls in, packSequences emits the training
    * rows themselves: within each stratum, documents concatenate in
    * `orderCol` order and split into EXACT `blockTokens`-token blocks
    * (the model's context length); a document straddling a boundary is
    * sliced across both blocks, so every block except a stratum's last
    * has exactly `blockTokens` tokens and no token is dropped or padded.
    *
    * Plan shape: the [[packShards]] running-sum window (same per-stratum
    * sizing rule), then `explode(sequence(firstBlock, lastBlock))` — a
    * document amplifies only by the number of blocks it TOUCHES
    * (ceil(nt/B)+1 worst case) — a narrow per-row slice of the token
    * array, and ONE groupBy on the fixed-width (stratum, block) key
    * whose sorted-struct reassembly is the SURVEY §2.9-bis
    * sorted-collect discipline. Every stage is integer arithmetic +
    * list slicing, so the operator is oracle-gated end-to-end.
    * Same [[packShards]] PRECONDITION: `orderCol` unique per stratum.
    *
    * `tokens` overrides WHAT gets packed (default: the [[TextStats.WsRun]]
    * word array) — pass [[TextStats.bpeTokens]] to pack subword tokens
    * into exact context-length blocks; `block_text` then joins subwords
    * by single spaces (packed training rows are token streams, not
    * prose — word boundaries are the tokenizer's concern, not the
    * packer's). */
  def packSequences(docs: DataFrame, blockTokens: Long,
                    partitionCols: Seq[String] = Seq("source"),
                    orderCol: String = "doc_id",
                    textCol: String = "text",
                    tokens: Option[Column] = None): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    require(!docs.columns.exists(Seq("block_id", "block_text", "n_tokens").contains),
      "packSequences writes block_id/block_text/n_tokens; input already has one — rename it first")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(blockTokens)
    val laid = docs
      .withColumn("__toks", tokens.getOrElse(split(col(textCol), TextStats.WsRun)))
      .withColumn("__nt", size(col("__toks")).cast("long"))
      .withColumn("__start", sum(col("__nt")).over(w) - col("__nt"))
    val exploded = laid.select(
      partitionCols.map(col) ++ Seq(
        col("__toks"), col("__nt"), col("__start"),
        explode(sequence(intDiv(col("__start"), b),
          intDiv(col("__start") + col("__nt") - 1, b))).as("block_id")): _*)
    val pieceFrom = greatest(col("block_id") * b, col("__start"))
    val pieceLen = least((col("block_id") + 1) * b, col("__start") + col("__nt")) - pieceFrom
    val pieces = exploded.select(
      partitionCols.map(col) ++ Seq(
        col("block_id"),
        col("__start"),
        slice(col("__toks"), (pieceFrom - col("__start") + 1).cast("int"),
          pieceLen.cast("int")).as("__piece")): _*)
    pieces
      .groupBy((partitionCols :+ "block_id").map(col): _*)
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("__start"), col("__piece")))),
        s => s.getField("__piece"))).as("__flat"))
      .select((partitionCols :+ "block_id").map(col) ++ Seq(
        array_join(col("__flat"), " ").as("block_text"),
        size(col("__flat")).cast("long").as("n_tokens")): _*)
  }

  /** Loss-mask span metadata for [[packSequences]]' layout: one row per
    * (block, document piece) — `span_start`/`span_len` locate each
    * document's slice INSIDE its block, which is exactly what a trainer
    * needs to reset attention (and mask loss) across document
    * boundaries within a packed block. Emitting the spans beside the
    * packed text (same `blockTokens`/`partitionCols`/`orderCol` →
    * bit-identical layout, spec-pinned) keeps the packed rows narrow
    * while the mask metadata stays exact.
    *
    * Plan shape: the [[packShards]] running-sum window, then the
    * block-range explode — and NOTHING else: no token arrays are
    * carried (only counts), no reassembly groupBy, no second exchange.
    * The spans stream is fixed-width and strictly narrower than
    * [[packSequences]]' — the cheapest member of the packing family.
    * Zero-token documents occupy no span (filtered before the explode —
    * a 0-length doc would otherwise walk the block sequence backwards).
    * Same PRECONDITION: `orderCol` unique per stratum.
    *
    * `tokenCount` overrides the length metric (pass
    * [[TextStats.bpeTokenCount]] for the subword-faithful layout —
    * pair it with [[packSequences]]`(tokens = bpeTokens(...))`). */
  def packSpans(docs: DataFrame, blockTokens: Long,
                partitionCols: Seq[String] = Seq("source"),
                orderCol: String = "doc_id",
                textCol: String = "text",
                tokenCount: Option[Column] = None): DataFrame = {
    require(blockTokens > 0, "blockTokens must be positive")
    require(!docs.columns.exists(Seq("block_id", "span_start", "span_len").contains),
      "packSpans writes block_id/span_start/span_len; input already has one — rename it first")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = lit(blockTokens)
    val laid = docs
      .withColumn("__nt", tokenCount
        .getOrElse(size(split(col(textCol), TextStats.WsRun)).cast("long")))
      .withColumn("__start", sum(col("__nt")).over(w) - col("__nt"))
      .where(col("__nt") > 0)
    val exploded = laid.select(
      partitionCols.map(col) ++ Seq(
        col(orderCol), col("__nt"), col("__start"),
        explode(sequence(intDiv(col("__start"), b),
          intDiv(col("__start") + col("__nt") - 1, b))).as("block_id")): _*)
    val pieceFrom = greatest(col("block_id") * b, col("__start"))
    val pieceLen = least((col("block_id") + 1) * b, col("__start") + col("__nt")) - pieceFrom
    exploded.select(
      partitionCols.map(col) ++ Seq(
        col("block_id"), col(orderCol),
        (pieceFrom - col("block_id") * b).as("span_start"),
        pieceLen.as("span_len")): _*)
  }

  /** Padding-waste sweep — block-size calibration for the PAD-TO-BLOCK
    * loading regime (one document per block, short blocks padded; the
    * regime a loader uses when documents must not straddle blocks —
    * contrast [[packSequences]], which concatenates and never pads).
    * For each candidate context length C: a doc of `nt` tokens fills
    * `ceil(nt/C)` blocks, wasting `ceil(nt/C)·C − nt` pad tokens; the
    * sweep reports, per candidate, total blocks, real tokens, padded
    * tokens and the waste fraction in round-half-up basis points — the
    * "which context length wastes the least compute on this corpus"
    * question answered in ONE corpus scan (the [[Classifier.sweep]]
    * shape: conditional aggregates over one shared token-count
    * projection, so every candidate is measured against the same
    * corpus by construction; |candidates| changes the aggregate width,
    * never the scan count). Zero-token docs occupy zero blocks.
    *
    * `tokenCount` overrides the metric (default [[TextStats.WsRun]]
    * runs; pass [[TextStats.bpeTokenCount]] for subword-faithful
    * budgets — the [[packShards]] contract). */
  /** Length-grouped batching — the pad-to-longest loading regime's
    * batch ASSIGNMENT (where [[paddingSweep]] calibrates a block size,
    * this op builds the batches): within each stratum, documents sort
    * by (token count, id) and chop into fixed-size batches of
    * `batchSize` docs, so same-batch documents have near-equal lengths
    * and the pad-to-max waste collapses (the dynamic-batching /
    * length-bucketing standard). Returns one row per batch:
    * `(partitionCols…, batch_id, n_docs, max_tokens, real_tokens,
    * waste_bp)` — waste in round-half-up basis points of the padded
    * total `max_tokens · n_docs` (0 for an all-empty batch). Batch ids
    * are 0-based per stratum in length order, so batch 0 is the
    * shortest — a curriculum-friendly ordering for free. Deterministic
    * and integer-exact end to end.
    *
    * Plan shape (100 TB): one narrow token projection, a per-stratum
    * row_number window over (n_tokens, id) — [[Packing]]'s sizing rule
    * applies verbatim (batch per (source, dt-bucket) when one stratum
    * dominates) — then a map-side-combinable groupBy on the fixed-width
    * (stratum, batch_id) key. The corpus shuffles once, for the sort. */
  def lengthBatches(df: DataFrame, batchSize: Int,
                    partitionCols: Seq[String] = Seq("source"),
                    idCol: String = "doc_id", textCol: String = "text",
                    tokenCount: Option[Column] = None): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    Seq("batch_id", "n_tokens").foreach(c => require(!df.columns.contains(c),
      s"lengthBatches writes a '$c' column; input already has one — rename it first"))
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("n_tokens"), col(idCol))
    val batched = df
      .withColumn("n_tokens", tokenCount.getOrElse(
        size(split(col(textCol), TextStats.WsRun)).cast("long")))
      .withColumn("batch_id",
        intDiv(row_number().over(w).cast("long") - 1L, lit(batchSize.toLong)))
    batched.groupBy((partitionCols :+ "batch_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("real_tokens"))
      .withColumn("__padded", col("max_tokens") * col("n_docs"))
      .withColumn("waste_bp", when(col("__padded") > 0,
          intDiv((col("__padded") - col("real_tokens")) * 20000L + col("__padded"),
            col("__padded") * 2L))
        .otherwise(lit(0L)))
      .drop("__padded")
  }

  def paddingSweep(docs: DataFrame, blockCandidates: Seq[Long],
                   textCol: String = "text",
                   tokenCount: Option[Column] = None): DataFrame = {
    require(blockCandidates.nonEmpty, "paddingSweep needs at least one candidate")
    require(blockCandidates.forall(_ > 0), "block sizes must be positive")
    require(blockCandidates.distinct.size == blockCandidates.size,
      "duplicate candidates — each output row must be one block size")
    val intDiv = graft.functions.VectorFunctions.intDiv _
    val nt = tokenCount
      .getOrElse(size(split(col(textCol), TextStats.WsRun)).cast("long"))
    val counted = docs.select(nt.as("__nt"))
    val sorted = blockCandidates.sorted
    val aggs = sorted.flatMap { c =>
      val blocks = intDiv(col("__nt") + (c - 1), lit(c))
      Seq(sum(blocks).as(s"__blocks_$c"),
        sum(col("__nt")).as(s"__toks_$c"),
        sum(blocks * c).as(s"__padded_$c"))
    }
    val wide = counted.agg(aggs.head, aggs.tail: _*)
    val rows = sorted.map { c =>
      val padded = coalesce(col(s"__padded_$c"), lit(0L))
      val toks = coalesce(col(s"__toks_$c"), lit(0L))
      struct(lit(c).as("block_tokens"),
        coalesce(col(s"__blocks_$c"), lit(0L)).as("n_blocks"),
        toks.as("total_tokens"),
        padded.as("padded_tokens"),
        when(padded > 0,
            intDiv((padded - toks) * 20000L + padded, padded * 2L))
          .otherwise(lit(0L)).as("waste_bp"))
    }
    wide.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** T5/UL2-style span-corruption PLANNING: the deterministic mask
    * layout a denoising-objective data loader precomputes per document —
    * how many tokens to mask (`noiseBp` of the token count, round-half-
    * up), how many spans (`n_mask / meanSpan`, round-half-up, ≥ 1), the
    * exact span placement, and the resulting encoder/decoder lengths
    * (input = unmasked tokens + one sentinel per span; target = masked
    * tokens + sentinels + EOS — the T5 length accounting that sizes the
    * packed batch BEFORE tokenization).
    *
    * Placement is blocked-jitter: span i owns token block
    * [i·stride, (i+1)·stride) (stride = n div n_spans) and starts at a
    * pseudo-random offset inside its block, derived from the affine
    * chain ((id mod p)·1000003 + 31·i + 7) mod p over p = 2³¹−1 — the
    * cross-engine hash family of the poly-minhash tier, so the whole
    * layout (not just the counts) replays in ANSI SQL. Blocks make
    * overlap impossible by construction — no sequential rejection scan,
    * no per-doc loop; spans land within ±stride of the uniform layout,
    * which is the controlled-spacing regime span corruption wants
    * anyway (independent uniform starts would need overlap resolution —
    * inherently sequential, and over-clusters masks besides).
    *
    * `spans` is the canonical `"start:len;start:len"` string (token
    * offsets, 0-based) — a STRING, not an array, per the oracle output
    * contract. One narrow projection; the per-row HOF over n_spans ≤
    * n·noiseBp/(10⁴·meanSpan) elements is interpreted but tiny. */
  def spanCorruption(docs: DataFrame, noiseBp: Long = 1500,
                     meanSpan: Long = 3, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    // ≤ 5000: above half-masking, ceil(n_mask/n_spans) can exceed the
    // block stride and the last span would run past the document — and
    // masking a majority of tokens isn't span corruption anyway.
    require(noiseBp > 0 && noiseBp <= 5000,
      s"noiseBp must be in (0, 5000], got $noiseBp")
    require(meanSpan >= 1, s"meanSpan must be >= 1, got $meanSpan")
    val p = 2147483647L
    val n = size(split(col(textCol), TextStats.WsRun)).cast("long")
    val counted = docs.select(col(idCol), n.as("__n"))
      .withColumn("__nm",
        greatest(lit(1L), intDiv(col("__n") * (2L * noiseBp) + 10000L, lit(20000L))))
      .withColumn("__ns",
        greatest(lit(1L), intDiv(col("__nm") * 2L + meanSpan, lit(2L * meanSpan))))
      .withColumn("__stride", intDiv(col("__n"), col("__ns")))
      .withColumn("__base", intDiv(col("__nm"), col("__ns")))
      .withColumn("__rem", pmod(col("__nm"), col("__ns")))
    val spans = transform(sequence(lit(0L), col("__ns") - 1L), i => {
      val len = col("__base") + when(i < col("__rem"), 1L).otherwise(0L)
      val room = greatest(col("__stride") - len, lit(1L))
      val h = pmod(pmod(col(idCol).cast("long"), lit(p)) * 1000003L + i * 31L + 7L, lit(p))
      concat_ws(":", (i * col("__stride") + pmod(h, room)).cast("string"),
        len.cast("string"))
    })
    counted.select(
      col(idCol),
      col("__n").as("n_tokens"),
      col("__nm").as("n_mask"),
      col("__ns").as("n_spans"),
      (col("__n") - col("__nm") + col("__ns")).as("input_len"),
      (col("__nm") + col("__ns") + 1L).as("target_len"),
      array_join(spans, ";").as("spans"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * document-level PSM): for a deterministic `fimRate`-bp slice of
    * docs, two lattice-drawn token cuts a ≤ b split the doc into
    * (prefix, middle, suffix) and the training text becomes
    * `<PRE>prefix<SUF>suffix<MID>middle` — the model learns to infill
    * from bidirectional context; the rest pass through unchanged
    * (`mode = plain`). Cut points ride the shared coprime hash lattice
    * (two independent affine draws mod n+1, sorted), so the transform
    * is retry-stable and partition-free; empty prefix/middle/suffix
    * all occur naturally (a=0, a=b, b=n) and reassembly is lossless
    * for single-space-tokenized text. ONE narrow projection — no
    * shuffle, no join; the declared ORDER BY is the only exchange.
    * Token counts travel as columns so a loss-mask builder downstream
    * needs no re-tokenization. */
  def fim(docs: DataFrame, fimRate: Int = 5000, idCol: String = "doc_id",
          textCol: String = "text"): DataFrame = {
    require(fimRate >= 0 && fimRate <= 10000,
      s"fimRate must be in [0, 10000] bp, got $fimRate")
    val t = split(col(textCol), " ")
    val n = size(t).cast("long")
    // small-prime affine draw (the house lattice discipline: multiplier
    // small enough that id·9301 stays in int64 past 10¹⁴ ids — a Knuth
    // 2654435761 multiplier would overflow, and DuckDB ERRORS on
    // BIGINT overflow rather than wrapping)
    val sel = pmod(col(idCol) * 9301L + 49297L, lit(10000L)) < fimRate
    val h1 = pmod(col(idCol) * 6007L + 1009L, n + 1L)
    val h2 = pmod(col(idCol) * 9973L + 7L, n + 1L)
    val a = least(h1, h2).cast("int")
    val b = greatest(h1, h2).cast("int")
    val joinTok = (c: Column) => array_join(c, " ")
    val prefix = joinTok(slice(t, lit(1), a))
    val middle = joinTok(slice(t, a + 1, b - a))
    val suffix = joinTok(slice(t, b + 1, n.cast("int") - b))
    docs.select(col(idCol),
      when(sel, "fim").otherwise("plain").as("fim_mode"),
      when(sel, a.cast("long")).otherwise(0L).as("n_prefix"),
      when(sel, (b - a).cast("long")).otherwise(n).as("n_middle"),
      when(sel, (n - b).cast("long")).otherwise(0L).as("n_suffix"),
      when(sel, concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
        lit("<MID>"), middle)).otherwise(col(textCol)).as("out_text"))
      .orderBy(col(idCol))
  }

  /** SFT chat-template assembly: per conversation, the turn rows
    * (`convCol`, `turnCol`, `roleCol`, `contentCol`) become ONE
    * training example — segments `<|role|>content` concatenated in
    * turn order — plus the LOSS-MASK spans: for every `maskRole`
    * (assistant) turn, the character range of its CONTENT (the tag is
    * never trained on) as a canonical `start:len;…` string, with
    * `masked_chars` the total supervised mass. A conversation whose
    * maskRole turns were all filtered upstream still assembles, with
    * an empty span list — the example carries no loss but keeps its
    * context role.
    *
    * Shape for 100 TB: offsets come from ONE running-sum window
    * partitioned by conversation, and the assembly is ONE groupBy on
    * the same key — the window's hash partitioning is reused, so the
    * corpus shuffles ONCE (conversations are the natural unit; no
    * conversation-sized skew exists that a turn cap upstream doesn't
    * bound). In-group order rides sorted collect_list (SURVEY
    * §2.9-bis), never shuffle arrival order. Deterministic: integer
    * offsets, ORDER BY conversation. */
  def chatPack(turns: DataFrame, convCol: String = "conv_id",
               turnCol: String = "turn", roleCol: String = "role",
               contentCol: String = "content",
               maskRole: String = "assistant"): DataFrame = {
    val seg = concat(lit("<|"), col(roleCol), lit("|>"), col(contentCol))
    val tagLen = (length(col(roleCol)) + 4L).cast("long")
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOfs = turns.select(col(convCol), col(turnCol), col(roleCol),
      seg.as("__s"), tagLen.as("__taglen"),
      length(col(contentCol)).cast("long").as("__clen"))
      .withColumn("__ofs",
        coalesce(sum(length(col("__s"))).over(w), lit(0L)).cast("long"))
    val isMask = col(roleCol) === maskRole
    withOfs.groupBy(col(convCol))
      .agg(count(lit(1)).as("n_turns"),
        sort_array(collect_list(struct(col(turnCol).as("t"),
          col("__s").as("s")))).as("__segs"),
        sort_array(collect_list(when(isMask, struct(col(turnCol).as("t"),
          concat_ws(":", (col("__ofs") + col("__taglen")).cast("string"),
            col("__clen").cast("string")).as("sp"))))).as("__spans"),
        sum(when(isMask, col("__clen")).otherwise(0L)).cast("long")
          .as("masked_chars"))
      .select(col(convCol), col("n_turns"),
        array_join(transform(col("__segs"), x => x.getField("s")), "")
          .as("assembled"),
        array_join(transform(col("__spans"), x => x.getField("sp")), ";")
          .as("mask_spans"),
        col("masked_chars"))
      .withColumn("total_chars", length(col("assembled")).cast("long"))
      .orderBy(col(convCol))
  }
}
