package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.toDF("user_id", "d")
      .select(col("user_id"), to_timestamp(col("d")).as("ts"))

  test("retention: cohort = first day, per-bucket distinct users, in-bucket dedup") {
    val events = ev(
      // user 1: cohort Jan 1; active days 1, 2 (bucket 0 ×2 → once), 9 (bucket 1)
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-09"),
      // user 2: same cohort, only day 1
      (2L, "2024-01-01"),
      // user 3: cohort Jan 5, active again day 20 (bucket 2)
      (3L, "2024-01-05"), (3L, "2024-01-20"))
    val out = Retention.retention(events, bucketDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    out shouldBe Map(
      ("2024-01-01", 0L) -> 2L,   // users 1 and 2; user 1's two bucket-0 days count once
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-05", 0L) -> 1L,
      ("2024-01-05", 2L) -> 1L)
  }

  test("retention: one user-keyed exchange does cohort AND day-set work") {
    val events = ev((1 to 120).map(i =>
      ((i % 10).toLong, f"2024-01-${i % 28 + 1}%02d")): _*)
    val plan = Retention.retention(events, bucketDays = 7)
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Window"
    // partitioning-invariant (collect_set order must not leak)
    val once = Retention.retention(events).collect()
    Retention.retention(events.repartition(7)).collect() shouldBe once
    an[IllegalArgumentException] should be thrownBy
      Retention.retention(events, bucketDays = 0)
  }
}
