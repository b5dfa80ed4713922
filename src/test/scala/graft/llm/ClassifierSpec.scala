package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Linear quality classifier: hand-computed scores, threshold semantics,
  * plan shape, and agreement with TextStats.quality's feature discipline. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("score matches a hand-computed linear combination") {
    // "b b c" → nt=3, len=5, ns(stopwords {b})=2, nd=2
    // ml_bp = round(1e4·(5-3+1)/3) = 10000, sr_bp = round(1e4·2/3) = 6667,
    // dr_bp = round(1e4·2/3) = 6667
    val docs = Seq((1L, "b b c")).toDF("doc_id", "text")
    val w = Classifier.Weights(wTokens = 2, wMeanLen = 1, wStopword = -1,
      wDistinct = 3, bias = 10)
    val out = Classifier.score(docs, w, threshold = 0, stopwords = Seq("b"))
      .as[(Long, Long, Boolean)].collect().head
    out._2 shouldBe (10 + 2 * 3 + 10000 - 6667 + 3 * 6667)
    out._3 shouldBe true
  }

  test("threshold is a >= cut and both branches are reachable") {
    val docs = Seq((1L, "x y z"), (2L, "w w w w w w")).toDF("doc_id", "text")
    // score = dr_bp: doc 1 → 10000 (all distinct), doc 2 → round(1e4/6)=1667
    val w = Classifier.Weights(wDistinct = 1)
    val out = Classifier.score(docs, w, threshold = 10000)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 10000L, true))  // exactly at threshold → keep
    out(1) shouldBe ((2L, 1667L, false))
  }

  test("scoring is one narrow projection — no shuffle, no join") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = Classifier.score(docs, Classifier.Weights(wTokens = 1), 0)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
  }

  test("zero weights score exactly the bias for every document") {
    val docs = Seq((1L, "a"), (2L, "b c d")).toDF("doc_id", "text")
    val out = Classifier.score(docs, Classifier.Weights(bias = 7), threshold = 8)
    out.select("score").as[Long].collect().toSet shouldBe Set(7L)
    out.where(col("keep")).count() shouldBe 0L
  }

  test("sweep agrees with score() at every threshold, in one scan") {
    val docs = Seq(
      (1L, "m n o p"), (2L, "q q q q"), (3L, "r s r s"),
      (4L, "t u v w x y"), (5L, "the the the")).toDF("doc_id", "text")
    val w = Classifier.Weights(wTokens = 10, wDistinct = 1, bias = -5000)
    val thresholds = Seq(-5000L, 0L, 5000L, 99999L)
    val out = Classifier.sweep(docs, w, thresholds)
      .orderBy("threshold").as[(Long, Long, Long)].collect()
    // parity against the gate operator itself, threshold by threshold —
    // sweep measuring a different model than score applies is the bug
    // this exists to catch
    thresholds.sorted.zip(out).foreach { case (t, (tOut, docsKept, toksKept)) =>
      tOut shouldBe t
      val kept = Classifier.score(docs, w, t).where(col("keep"))
      docsKept shouldBe kept.count()
      val keptIds = kept.select("doc_id").as[Long].collect().toSet
      val toks = docs.collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").length.toLong).toMap
      toksKept shouldBe keptIds.toSeq.map(toks).sum
    }
    out.head._2 shouldBe 5L   // -5000 keeps everything
    out.last._2 shouldBe 0L   // 99999 keeps nothing (coalesce path)
    val plan = Classifier.sweep(docs, w, thresholds)
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    an[IllegalArgumentException] should be thrownBy
      Classifier.sweep(docs, w, Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Classifier.sweep(docs, w, Seq(1L, 1L))
  }

  test("calibration: hand-walked bins, clamp, gap and ECE lanes") {
    // preds: 500 (bin 0), 1500 (bin 1), 1500 (bin 1), 12000→clamp 9999
    // (bin 9), -50→clamp 0 (bin 0); labels T/F/T/T/F.
    // bin 0: n=2 preds {500,0} mean 250, pos 1 → obs 5000, gap 4750
    // bin 1: n=2 preds {1500,1500} mean 1500, pos 1 → obs 5000, gap 3500
    // bin 9: n=1 pred 9999, pos 1 → obs 10000, gap 1
    val rows = Seq((500L, true), (1500L, false), (1500L, true),
      (12000L, true), (-50L, false)).toDF("p", "y")
    val out = Classifier.calibration(rows, col("p"), col("y")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out should have size 3
    out(0L) shouldBe ((2L, 250L, 5000L, 4750L, 9500L))
    out(1L) shouldBe ((2L, 1500L, 5000L, 3500L, 7000L))
    out(9L) shouldBe ((1L, 9999L, 10000L, 1L, 1L))
    // ONE aggregation, no join, no window — the |bins|-key shape
    val plan = Classifier.calibration(
      spark.range(100).select(col("id") * 100L, col("id") % 2 === 0)
        .toDF("p", "y"), col("p"), col("y"))
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Window"
    an[IllegalArgumentException] should be thrownBy
      Classifier.calibration(rows, col("p"), col("y"), bins = 1)
  }
}
