package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "tsu", "event_id")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("event_id"))

  test("sessionize: gap splits, boundary is INCLUSIVE, per-session stats exact") {
    val events = ev(
      (1L, 100L, 1L), (1L, 150L, 2L),   // gap 50 == gapUs → SAME session
      (1L, 201L, 3L),                   // gap 51 > 50 → new session
      (2L, 10L, 4L))
    val out = Sessionize.sessionize(events, gapUs = 50L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      (1L, 1L, 2L, 100L, 150L, 50L),
      (1L, 2L, 1L, 201L, 201L, 0L),
      (2L, 1L, 1L, 10L, 10L, 0L))
  }

  test("sessionize: ONE window exchange feeds both lag and the running index") {
    val events = ev((1 to 100).map(i =>
      ((i % 4).toLong, i.toLong * 1000, i.toLong)): _*)
    val plan = Sessionize.sessionize(events, gapUs = 5000L)
      .queryExecution.executedPlan.toString
    // lag + cumulative sum share the (user, ts) partitioning, AND the
    // (user, session_idx) rollup is satisfied by the same user-hash
    // distribution — ONE exchange for the whole operator
    "(?i)exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    // partitioning-invariant
    val once = Sessionize.sessionize(events, 5000L).collect()
    Sessionize.sessionize(events.repartition(7), 5000L)
      .collect() shouldBe once
    an[IllegalArgumentException] should be thrownBy
      Sessionize.sessionize(events, 0L)
  }
}
