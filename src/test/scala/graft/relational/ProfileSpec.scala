package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, string min/max, exact-at-small-cardinality estimates") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a")), (None, Some("a")))
      .toDF("k", "s")
    val out = Profile.profile(df, Seq("s", "k")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5)))).toMap
    out should have size 2
    // HLL is exact at tiny cardinality — any drift is a pipeline bug
    out("k") shouldBe ((4L, 1L, "1", "3", 2L))
    out("s") shouldBe ((4L, 1L, "a", "b", 2L))
    // output order is column-name-sorted regardless of request order
    Profile.profile(df, Seq("s", "k")).collect().map(_.getString(0))
      .toSeq shouldBe Seq("k", "s")
  }

  test("profile is ONE global aggregation — no join, no window, no per-column pass") {
    val df = spark.range(500).select(col("id").as("a"),
      pmod(col("id"), lit(7)).as("b"), concat(lit("v"), col("id")).as("c"))
    val plan = Profile.profile(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Window"
    // one partial+final aggregate pair — a multi-distinct Expand here
    // would mean the profiler is paying the per-column exchange the
    // scaladoc promises it never does
    plan should not include "Expand"
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(df, Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(df, Seq("a", "a"))
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(df, Seq("nope"))
  }
}
