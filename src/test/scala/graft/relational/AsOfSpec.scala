package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: backward-inclusive, per-key, null when no prior
  * right row, and one window shuffle — no nested-loop join in the plan. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // (key, t, label) — quotes at t=10,20 for key A; one quote for key B
  private def quotes = Seq(
    ("A", 10L, "a10"), ("A", 20L, "a20"), ("B", 15L, "b15"))
    .toDF("k", "t", "q")
  // trades: before any quote, between, exactly at a quote, after all
  private def trades = Seq(
    ("A", 5L, 100.0), ("A", 12L, 101.0), ("A", 20L, 102.0), ("A", 25L, 103.0),
    ("B", 14L, 200.0), ("B", 16L, 201.0))
    .toDF("k", "t", "px")

  test("backward-inclusive as-of: latest quote at or before each trade") {
    val out = AsOf.joinAsOf(trades, quotes, "t", Seq("k"), Seq("q"))
      .orderBy("k", "t")
      .select("k", "t", "q").as[(String, Long, Option[String])].collect()
    out shouldBe Array(
      ("A", 5L, None),          // before first quote
      ("A", 12L, Some("a10")),  // between quotes
      ("A", 20L, Some("a20")),  // tie → inclusive: same-instant quote wins
      ("A", 25L, Some("a20")),  // after last quote
      ("B", 14L, None),
      ("B", 16L, Some("b15")))
  }

  test("multiple payload columns come from the same right row") {
    val q2 = quotes.withColumn("src", concat(lit("s-"), col("q")))
    val out = AsOf.joinAsOf(trades, q2, "t", Seq("k"), Seq("q", "src"))
      .where(col("q").isNotNull)
      .select("q", "src").as[(String, String)].collect()
    out.foreach { case (q, src) => src shouldBe s"s-$q" }
  }

  test("as-of plan is one window over the union — no nested-loop join") {
    val plan = AsOf.joinAsOf(trades, quotes, "t", Seq("k"), Seq("q"))
      .queryExecution.executedPlan.toString
    plan should include("Window")
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin" // not a join at all — a scan
  }

  test("maxGap nulls out stale matches (pandas merge_asof tolerance)") {
    // quotes at 10, 20; trades at 12 (gap 2), 25 (gap 5), 28 (gap 8)
    val t = Seq(("A", 12L, 1L), ("A", 25L, 2L), ("A", 28L, 3L))
      .toDF("k", "t", "tid")
    val out = AsOf.joinAsOf(t, quotes, "t", Seq("k"), Seq("q"),
        maxGap = Some(lit(5L)))
      .orderBy("tid").select("tid", "q").as[(Long, Option[String])].collect()
    out shouldBe Array(
      (1L, Some("a10")),  // gap 2 ≤ 5
      (2L, Some("a20")),  // gap 5 ≤ 5 (inclusive)
      (3L, None))         // gap 8 → stale
  }

  test("maxGap works on timestamp columns with an interval bound") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val q = Seq(("A", ts(10), "q10")).toDF("k", "t", "q")
    val t = Seq(("A", ts(15), 1L), ("A", ts(40), 2L)).toDF("k", "t", "tid")
    val out = AsOf.joinAsOf(t, q, "t", Seq("k"), Seq("q"),
        maxGap = Some(expr("INTERVAL 10 MINUTES")))
      .orderBy("tid").select("tid", "q").as[(Long, Option[String])].collect()
    out shouldBe Array((1L, Some("q10")), (2L, None))
  }

  test("as-of agrees with the naive range-join formulation on random data") {
    val rnd = new scala.util.Random(11)
    val tradesR = (0 until 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "tid")
    val quotesR = (0 until 200).map(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "t", "qid")
      .groupBy("k", "t").agg(max("qid").as("qid")) // unique per (k, t)
    val got = AsOf.joinAsOf(tradesR, quotesR, "t", Seq("k"), Seq("qid"))
      .select("tid", "qid").as[(Long, Option[Long])].collect().toMap
    // naive: per trade, the max-(q.t, qid) quote among all q.t <= t — an
    // O(n·m) range join the operator exists to avoid
    val naive = tradesR.as("l")
      .join(quotesR.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.tid"))
      .agg(max(struct(col("r.t"), col("r.qid"))).as("m"))
      .select(col("tid"), col("m.qid"))
      .as[(Long, Option[Long])].collect().toMap
    got shouldBe naive
  }

  test("colliding payload names are rejected") {
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(trades, quotes.withColumn("px", lit(1)), "t", Seq("k"), Seq("px"))
    }
    e.getMessage should include("collide")
  }

  test("reserved working columns on either input are rejected, not overwritten") {
    for (c <- Seq("__asof", "__tag")) {
      val el = intercept[IllegalArgumentException] {
        AsOf.joinAsOf(trades.withColumn(c, lit(1)), quotes, "t", Seq("k"), Seq("qid"))
      }
      el.getMessage should include("reserved")
      val er = intercept[IllegalArgumentException] {
        AsOf.joinAsOf(trades, quotes.withColumn(c, lit(1)), "t", Seq("k"), Seq("qid"))
      }
      er.getMessage should include("reserved")
    }
  }
}
