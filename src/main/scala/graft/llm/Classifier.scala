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
    import TextStats.bp
    val s =
      lit(w.bias) +
        lit(w.wTokens) * col("__nt") +
        lit(w.wMeanLen) * bp(col("__len") - col("__nt") + 1, col("__nt")) +
        lit(w.wStopword) * bp(col("__ns"), col("__nt")) +
        lit(w.wDistinct) * bp(col("__nd"), col("__nt"))
    counted.select(col(idCol), s.as("score"),
      (s >= threshold).as("keep"))
  }
}
