package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toDF("user_id", "tsu", "event_type", "event_id")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("event_type"), col("event_id"))

  test("funnel: greedy-earliest depth, gap enforcement, completion ts") {
    val events = ev(
      // user 1 completes: view@10, click@20, purchase@30
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L), (1L, 30L, "purchase", 3L),
      // user 2 stalls at click: purchase arrives OUTSIDE the gap
      (2L, 10L, "view", 4L), (2L, 20L, "click", 5L), (2L, 200L, "purchase", 6L),
      // user 3: purchase BEFORE click never counts (order matters)
      (3L, 10L, "view", 7L), (3L, 20L, "purchase", 8L), (3L, 30L, "click", 9L),
      // user 4: no matching first step at all
      (4L, 10L, "error", 10L))
    val out = Funnel.funnel(events, Seq("view", "click", "purchase"),
        maxGapUs = 50L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    out(1L) shouldBe ((3L, 30L))
    out(2L) shouldBe ((2L, -1L))
    out(3L) shouldBe ((2L, -1L))   // view then click; early purchase ignored
    out(4L) shouldBe ((0L, -1L))
  }

  test("funnel: greedy-earliest is DECLARED non-maximal; first step has no gap") {
    // the earliest view at ts 10 times out against click@100 (gap 50),
    // even though view@90 would have completed — greedy takes the first
    val events = ev(
      (1L, 10L, "view", 1L), (1L, 90L, "view", 2L), (1L, 100L, "click", 3L))
    Funnel.funnel(events, Seq("view", "click"), maxGapUs = 50L)
      .collect().head.getLong(1) shouldBe 1L
    // …but the FIRST step matches at any time (no predecessor to gap on)
    val late = ev((1L, 999999L, "view", 1L))
    Funnel.funnel(late, Seq("view", "click"), maxGapUs = 1L)
      .collect().head.getLong(1) shouldBe 1L
  }

  test("funnel: one user-keyed exchange + sort, partitioning-invariant") {
    val events = ev((1 to 60).map(i =>
      ((i % 5).toLong, i.toLong * 10, Seq("view", "click", "purchase",
        "error", "signup")(i % 5), i.toLong)): _*)
    val once = Funnel.funnel(events, Seq("view", "click"), 1000L).collect()
    Funnel.funnel(events.repartition(7), Seq("view", "click"), 1000L)
      .collect() shouldBe once
    val plan = Funnel.funnel(events, Seq("view", "click"), 1000L)
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnel(events, Seq.empty, 10L)
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnel(events, Seq("view", "view"), 10L)
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnel(events, Seq("view"), 0L)
  }

  test("funnel: string event ids hash to a deterministic tie, non-castable rejected") {
    // same stream as the greedy test but with string ids — a blind
    // cast("long") would have NULLed every tie
    val events = Seq(
      (1L, 10L, "view", "ev-a"), (1L, 20L, "click", "ev-b"),
      (2L, 10L, "view", "ev-c"))
      .toDF("user_id", "tsu", "event_type", "event_id")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("event_type"), col("event_id"))
    val out = Funnel.funnel(events, Seq("view", "click"), 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 2L
    out(2L) shouldBe 1L
    // a tie column that can't order deterministically is a caller error
    val badTie = events.withColumn("event_id", array(col("user_id")))
    an[IllegalArgumentException] should be thrownBy
      Funnel.funnel(badTie, Seq("view", "click"), 1000L)
  }
}
