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

  test("retention: all-codegen shape — no object agg, no join, bucket dedup rides the user hash") {
    val events = ev((1 to 120).map(i =>
      ((i % 10).toLong, f"2024-01-${i % 28 + 1}%02d")): _*)
    val df = Retention.retention(events, bucketDays = 7)
    val plan = df.queryExecution.executedPlan.toString
    // the r15 redesign: collect_set's ObjectHashAggregate fell back to
    // sort-based aggregation at scale (2.4 GB probe spill at 10×) —
    // every aggregate here must stay a codegen HashAggregate
    plan should not include "ObjectHashAggregate"
    plan should not include "Join"
    // exactly 3 hash exchanges pre-sort: raw→(user,day) distinct, the
    // window's user hash (which the (user,cohort,bucket) dedup RIDES —
    // a 4th would mean the subset rule broke), and the final cells agg
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 3
    // partitioning-invariant
    val once = df.collect()
    Retention.retention(events.repartition(7)).collect() shouldBe once
    an[IllegalArgumentException] should be thrownBy
      Retention.retention(events, bucketDays = 0)
  }
}
