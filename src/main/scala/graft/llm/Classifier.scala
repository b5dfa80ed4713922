package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the "fastText quality classifier" stage
  * of a pretraining pipeline (CCNet/GPT-3-style), as the ENGINE sees it:
  * the weights are trained offline and arrive as constants; the engine's
  * job is to apply a per-document linear scorer as one narrow codegen'd
  * projection over the scan, at 100 TB, with a decision threshold.
  *
  * Everything is INTEGER arithmetic over the same round-half-up
  * basis-point features [[TextStats.quality]] uses, so the score — not
  * just the keep/drop decision — is cross-engine exact and oracle-gated.
  * A monotone link (sigmoid) would not change the ranking or the
  * thresholded decision, which is all a filter consumes; pipelines that
  * need calibrated probabilities apply it downstream of this operator.
  */
object Classifier {

  /** Integer weights over the basis-point feature vector. Score magnitude
    * is bounded by `|bias| + |wTokens|·nt + (|wMeanLen| + |wStopword| +
    * |wDistinct|)·10⁴ₓ` with ratio features ≤ ~10⁵ bp — far inside Long
    * for any realistic weight scale (document lengths bound nt). */
  final case class Weights(
      wTokens: Long = 0L,
      wMeanLen: Long = 0L,
      wStopword: Long = 0L,
      wDistinct: Long = 0L,
      bias: Long = 0L)

  // the linear form over bpFeatures' columns — ONE definition for score
  // and sweep, so a calibration sweep can never measure a different
  // model than the gate applies
  private def scoreCol(w: Weights): Column = {
    import TextStats.bp
    lit(w.bias) +
      lit(w.wTokens) * col("__nt") +
      lit(w.wMeanLen) * bp(col("__len") - col("__nt") + 1, col("__nt")) +
      lit(w.wStopword) * bp(col("__ns"), col("__nt")) +
      lit(w.wDistinct) * bp(col("__nd"), col("__nt"))
  }

  /** Per-document linear quality score plus thresholded keep decision.
    *
    * Features (all integer): token count; mean token length, stopword
    * ratio and distinct-token ratio in 4dp round-half-up basis points
    * (`(20000·a + b) div (2·b)` — the [[TextStats.quality]] discipline).
    * `score = bias + w·features`; `keep = score >= threshold`. One
    * projection, no shuffle, no UDF — the classifier gate composes with
    * scan-pushed filters in a single whole-stage-codegen span. */
  def score(docs: DataFrame, w: Weights, threshold: Long,
            stopwords: Seq[String] = TextStats.DefaultStopwords,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // ONE feature definition shared with TextStats.quality — the
    // classifier's features can never silently diverge from the quality
    // operator's (both the projection and the bp formula live there)
    val counted = TextStats.bpFeatures(docs, stopwords, idCol, textCol)
    val s = scoreCol(w)
    counted.select(col(idCol), s.as("score"),
      (s >= threshold).as("keep"))
  }

  /** Threshold calibration — the "what cutoff keeps X % of the corpus"
    * sweep run before committing a classifier gate: for each candidate
    * threshold, the kept-document and kept-token counts (tokens in the
    * feature tokenization, `__nt` — the same count the model scores).
    * ONE corpus scan regardless of how many thresholds: each candidate
    * is a pair of conditional aggregates over the same score projection
    * — map-side combined, the exchange carries 2·|thresholds| partials —
    * versus running [[score]]+count once per candidate. Output one row
    * per threshold, ascending. */
  def sweep(docs: DataFrame, w: Weights, thresholds: Seq[Long],
            stopwords: Seq[String] = TextStats.DefaultStopwords,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(thresholds.nonEmpty, "sweep needs at least one threshold")
    require(thresholds.distinct.size == thresholds.size,
      "duplicate thresholds — each output row must be one candidate")
    val counted = TextStats.bpFeatures(docs, stopwords, idCol, textCol)
    val scored = counted.select(scoreCol(w).as("score"), col("__nt"))
    val sorted = thresholds.sorted
    val aggs = sorted.flatMap { t =>
      Seq(sum(when(col("score") >= t, 1L).otherwise(0L)).as(s"__kept_$t"),
        sum(when(col("score") >= t, col("__nt")).otherwise(0L)).as(s"__toks_$t"))
    }
    val wide = scored.agg(aggs.head, aggs.tail: _*)
    val rows = sorted.map { t =>
      struct(lit(t).as("threshold"),
        coalesce(col(s"__kept_$t"), lit(0L)).as("kept_docs"),
        coalesce(col(s"__toks_$t"), lit(0L)).as("kept_tokens"))
    }
    wide.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.threshold"), col("__r.kept_docs"), col("__r.kept_tokens"))
  }

  /** Reliability-diagram calibration audit (r14) — the check a pipeline
    * runs before TRUSTING a classifier gate's scores as probabilities
    * (Guo et al. 2017's ECE, the binned form): bucket documents by
    * predicted probability (basis points, clamped to [0, 9999]) into
    * `bins` equal-width bins; per bin emit the count, the round-half-up
    * mean predicted bp, the observed positive rate bp against a label
    * column, the absolute gap, and the ECE numerator lane `n · gap`
    * (callers divide by Σn downstream — the per-bin lane keeps every
    * row integer-exact and mergeable). A well-calibrated gate shows
    * gap ≈ 0 in every populated bin; a confident-but-wrong one shows
    * the characteristic high-bin bulge. An empty bin yields no row
    * (both engines).
    *
    * Scale shape: ONE groupBy over ≤ `bins` keys — partial aggregation
    * combines map-side, the exchange carries |bins| partials, the sort
    * is |bins| rows. Composes with [[score]] in the same scan
    * projection; no join, no window, no second pass. */
  def calibration(df: DataFrame, predBp: Column, label: Column,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    val intDiv = graft.functions.VectorFunctions.intDiv _
    val p = greatest(lit(0L), least(lit(9999L), predBp.cast("long")))
    val y = when(label.cast("boolean"), 1L).otherwise(0L)
    df.select(intDiv(p * bins, lit(10000L)).as("bin"),
        p.as("__p"), y.as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__p")).as("__sp"),
        sum(col("__y")).as("__sy"))
      .select(col("bin"), col("n"),
        intDiv(col("__sp") * 2L + col("n"), col("n") * 2L).as("mean_pred_bp"),
        intDiv(col("__sy") * 20000L + col("n"), col("n") * 2L).as("obs_bp"))
      .withColumn("gap_bp", abs(col("mean_pred_bp") - col("obs_bp")))
      .withColumn("ece_num", col("n") * col("gap_bp"))
      .orderBy(col("bin"))
  }
}
