package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Total n-gram language-model score of a word array — the KenLM-shaped
  * "perplexity filter" stage real pretraining pipelines run (CCNet /
  * Gopher style: drop documents whose per-token LM score says they don't
  * look like the reference corpus). The MODEL IS DATA: integer
  * centi-log-prob scores for unigrams and bigrams plus backoff/OOV
  * penalties, so scoring is pure table lookup + integer addition —
  * deterministic, cross-engine exact, and DuckDB-oracle-able (a learned
  * float LM would be none of those).
  *
  * Score = Σ over transitions i = 2..n of
  *   bigram(w_{i-1}, w_i)                    when the bigram is in the model
  *   unigram(w_i) + backoffPenalty           when only the target word is
  *   oovPenalty                              otherwise.
  * Fewer than two words → 0 (no transitions). Normalize downstream by
  * the transition count (`greatest(size - 1, 0)`) — kept OUT of the
  * kernel so the gate arithmetic stays visible integer SQL.
  *
  * Scale shape: the model compiles once into nested hash maps carried by
  * the expression (`addReferenceObj`, the static-kernel discipline) —
  * one narrow codegen'd projection per document, no explode, no model
  * join, no shuffle. A production-size bigram table (millions of
  * entries, ~100 MB) ships once with the plan like any broadcast — far
  * below the corpus-side explode + join it replaces. */
case class NgramLmScore(child: Expression,
                        unigrams: Seq[(String, Long)],
                        bigrams: Seq[(String, String, Long)],
                        backoffPenalty: Long,
                        oovPenalty: Long) extends UnaryExpression {

  @transient private lazy val uni: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](unigrams.size * 2)
    unigrams.foreach { case (w, s) => m.put(UTF8String.fromString(w), s) }
    m
  }

  @transient private lazy val bi:
      java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
    bigrams.foreach { case (w1, w2, s) =>
      m.computeIfAbsent(UTF8String.fromString(w1),
        _ => new java.util.HashMap[UTF8String, java.lang.Long](4))
        .put(UTF8String.fromString(w2), s)
    }
    m
  }

  override def prettyName: String = "graft_ngram_lm_score"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.sql}")
  }

  def score(words: ArrayData): Long = {
    val n = words.numElements()
    var total = 0L
    var i = 1
    while (i < n) {
      val prev = if (words.isNullAt(i - 1)) null else words.getUTF8String(i - 1)
      val cur = if (words.isNullAt(i)) null else words.getUTF8String(i)
      val bm = if (prev == null) null else bi.get(prev)
      val bs = if (bm == null || cur == null) null else bm.get(cur)
      if (bs != null) total += bs.longValue()
      else {
        val us = if (cur == null) null else uni.get(cur)
        if (us != null) total += us.longValue() + backoffPenalty
        else total += oovPenalty
      }
      i += 1
    }
    total
  }

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramLmScore", this,
      classOf[NgramLmScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramLmScore {
  def apply(words: Column, unigrams: Seq[(String, Long)],
            bigrams: Seq[(String, String, Long)],
            backoffPenalty: Long, oovPenalty: Long): Column =
    ColumnBridge.column(NgramLmScore(
      ColumnBridge.expression(words), unigrams, bigrams, backoffPenalty, oovPenalty))
}
