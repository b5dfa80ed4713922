package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation.selectFull (the selection-tier composite) plus the two
  * composition faces it rides on: TextStats.dsirKeep must agree with
  * the gated dsir projection, Sampling.unimax's carryCols must be pure
  * column carriage, and the composite must equal the independently
  * chained stage-by-stage formulation (join-back instead of in-place
  * carry). llm_select_full gates the arithmetic against DuckDB; this
  * spec gates the COMPOSITION — that the one-plan shape computes the
  * same thing as the naive multi-join shape it optimizes away. */
class SelectFullSpec extends SparkSpec {
  import spark.implicits._

  // Two-vocabulary corpus (DsirSpec's planting): target-lang docs draw
  // from vocab A, the rest from vocab B, lengths varied so the budget
  // window and water-filling both discriminate. Langs skewed (en 2x).
  private val vocabA = Seq("alpha", "bravo", "charlie", "delta", "echo")
  private val vocabB = Seq("zulu", "yankee", "xray", "whiskey", "victor")

  private def docs = {
    val rows = (0 until 48).map { i =>
      val lang = if (i % 4 < 2) "en" else if (i % 4 == 2) "de" else "fr"
      val src = s"src${i % 3}"
      val v = if (lang == "en") vocabA else vocabB
      val n = 4 + (i * 7) % 9
      val text = (0 until n).map(j => v((i + j) % v.size)).mkString(" ")
      (i.toLong, src, lang, text)
    }
    rows.toDF("doc_id", "source", "lang", "text")
  }

  private val kf = 0.5
  private val budget = 60L
  private val bbp = 14000L
  private val epochs = 2
  private val rps = 8L

  private def full = Curation.selectFull(docs,
    isTarget = col("lang") === "en", keepFraction = kf,
    budgetTokens = budget, budgetBp = bbp, maxEpochs = epochs,
    rowsPerShard = rps, k = 2, buckets = 16, quantum = 256L)

  test("dsirKeep agrees with dsir and carries every input column") {
    val kept = TextStats.dsirKeep(docs, col("lang") === "en", kf,
      k = 2, buckets = 16, quantum = 256L)
    kept.columns.toSeq shouldBe (docs.columns.toSeq :+ "dsir_score")
    val proj = TextStats.dsir(docs, col("lang") === "en", kf,
      k = 2, buckets = 16, quantum = 256L)
    kept.select("doc_id", "dsir_score").as[(Long, Long)].collect().toSet shouldBe
      proj.as[(Long, Long)].collect().toSet
    // and the carried columns are the input's, unchanged
    val back = kept.drop("dsir_score").as[(Long, String, String, String)]
      .collect().toSet
    val sub = docs.as[(Long, String, String, String)].collect().toSet
    assert(back.subsetOf(sub), "dsirKeep must carry input rows unchanged")
  }

  test("unimax carryCols is pure column carriage") {
    val base = Sampling.unimax(docs, bbp, epochs, stratumCol = "lang")
    val carried = Sampling.unimax(docs, bbp, epochs, stratumCol = "lang",
      carryCols = Seq("text", "source"))
    carried.columns.toSeq shouldBe
      Seq("doc_id", "lang", "n_tokens", "epoch", "text", "source")
    carried.select("doc_id", "lang", "n_tokens", "epoch")
      .as[(Long, String, Long, Long)].collect().toSet shouldBe
      base.as[(Long, String, Long, Long)].collect().toSet
    // carried values match the input row they came from
    val j = carried.join(docs.withColumnRenamed("text", "t2")
        .withColumnRenamed("source", "s2"), Seq("doc_id"))
      .where(col("text") =!= col("t2") || col("source") =!= col("s2"))
    j.count() shouldBe 0L
  }

  test("selectFull equals the chained join-back formulation") {
    // the naive shape: id-projection dsir + join back, unimax without
    // carry + join text back — two extra corpus joins the composite's
    // in-place carry avoids; output must be identical
    val keptIds = TextStats.dsir(docs, col("lang") === "en", kf,
      k = 2, buckets = 16, quantum = 256L).select("doc_id")
    val sel = docs.join(keptIds, Seq("doc_id"))
    val bud = Sampling.tokenBudget(sel, budget)
      .withColumnRenamed("n_tokens", "__nt")
    val uni = Sampling.unimax(bud, bbp, epochs, stratumCol = "lang",
      tokenCount = Some(col("__nt")))
    val withText = uni.join(docs.select("doc_id", "text"), Seq("doc_id"))
    val laid = graft.llm.Packing.shuffleShards(
        withText.withColumn("__rid",
          col("doc_id") * epochs.toLong + col("epoch")),
        rps, idCol = "__rid")
      .drop("__rid")
      .select("doc_id", "lang", "n_tokens", "epoch", "text",
        "shard_id", "pos_in_shard")
    val expected = laid.as[(Long, String, Long, Long, String, Long, Long)]
      .collect().toSet
    expected should not be empty
    full.select("doc_id", "lang", "n_tokens", "epoch", "text",
        "shard_id", "pos_in_shard")
      .as[(Long, String, Long, Long, String, Long, Long)]
      .collect().toSet shouldBe expected
  }

  test("every stage of the composite is live on the fixture") {
    val n = docs.count()
    val kept = TextStats.dsir(docs, col("lang") === "en", kf,
      k = 2, buckets = 16, quantum = 256L).count()
    assert(kept > 0 && kept < n, "DSIR gate must split non-trivially")
    val layout = full.localCheckpoint()
    val slots = layout.count()
    val budgeted = layout.select("doc_id").distinct().count()
    assert(budgeted < kept, "budget cap must bind")
    assert(slots > budgeted, "some stratum must earn a second epoch")
    layout.agg(max("epoch")).as[Long].head() shouldBe (epochs - 1).toLong
  }

  test("manifest over the layout: full coverage, contiguous shards") {
    val layout = full.localCheckpoint()
    val mani = Audit.shardManifest(layout).localCheckpoint()
    mani.agg(sum("n_docs")).as[Long].head() shouldBe layout.count()
    mani.where(!col("contiguous")).count() shouldBe 0L
    // every shard but the last holds exactly rowsPerShard slots
    val lastShard = mani.agg(max("shard_id")).as[Long].head()
    mani.where(col("shard_id") < lastShard && col("n_docs") =!= rps)
      .count() shouldBe 0L
  }

  test("final plan reads only the budget-bounded checkpoint - no parquet re-scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_selfull").toString
    docs.write.mode("overwrite").parquet(dir)
    val pq = spark.read.parquet(dir)
    val mani = Audit.shardManifest(Curation.selectFull(pq,
      isTarget = col("lang") === "en", keepFraction = kf,
      budgetTokens = budget, budgetBp = bbp, maxEpochs = epochs,
      rowsPerShard = rps, k = 2, buckets = 16, quantum = 256L))
    // the corpus's three scans (distribution, histogram, keep+budget)
    // all sit BEHIND the budget-boundary localCheckpoint; everything
    // downstream — unimax's two consumers, the global sort, the
    // manifest agg — must ride the checkpointed budget-bounded frame,
    // so the final physical plan contains NO parquet scan at all
    val plan = mani.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    withClue(plan.linesIterator.filter(_.contains("Scan")).mkString("\n")) {
      plan.linesIterator.count(_.contains("Scan parquet")) shouldBe 0
    }
  }

  test("slot-key overflow throws loudly instead of colliding layout positions") {
    // ids past Long.Max/maxEpochs would wrap id*maxEpochs+epoch and
    // double-book shard positions — the row-wise guard must raise, and
    // the error must surface the offending id range. collect(), not
    // count(): count prunes the projection carrying the guard.
    val huge = docs.withColumn("doc_id",
      col("doc_id") + lit(Long.MaxValue / 2 + 10L))
    // construction itself may raise: the layout's offset index runs
    // driver-side jobs over the guarded projection
    val e = intercept[Exception] {
      Curation.selectFull(huge,
        isTarget = col("lang") === "en", keepFraction = kf,
        budgetTokens = budget, budgetBp = bbp, maxEpochs = epochs,
        rowsPerShard = rps, k = 2, buckets = 16, quantum = 256L)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    withClue(chain(e).mkString(" | ")) {
      chain(e).exists(_.contains("slot-key range")) shouldBe true
    }
  }
}
