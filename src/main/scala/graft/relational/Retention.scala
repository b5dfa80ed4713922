package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the third classic of the event-analytics triad
  * (with [[Funnel]] and [[Sessionize]]): bucket users by their FIRST
  * active day (the cohort) and count, per cohort and per elapsed
  * `bucketDays` window, how many of them were active again — the
  * retention matrix every growth dashboard renders.
  *
  * Shape for 100 TB: ONE user-keyed exchange does all the per-user
  * work (`min(day)` = the cohort AND the distinct active-day set ride
  * the same aggregate — a join-back formulation would shuffle the raw
  * events a second time); the day set is calendar-bounded (≤ the
  * corpus's day span, NEVER event-count-sized — `collect_set` of
  * dates), offsets dedup per user inside the array (a user active
  * twice in one bucket counts once, so the final `count(*)` over
  * exploded (user, bucket) rows IS a distinct-user count with no
  * second distinct aggregate), and the rollup exchange carries
  * |cohorts|·|buckets| cells. Emits `(cohort_day, bucket_offset, n_users)` —
  * the offset in `bucketDays` units (`bucket_offset`, not `offset`:
  * reserved in ANSI engines, the bare-alias trap) from the cohort day; ORDER BY cohort,
  * offset. */
object Retention {

  def retention(events: DataFrame, bucketDays: Int = 7,
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    val intDiv = graft.functions.VectorFunctions.intDiv _
    val perUser = events
      .select(col(userCol), to_date(col(tsCol)).as("__d"))
      .groupBy(col(userCol))
      .agg(min(col("__d")).as("cohort_day"),
        collect_set(col("__d")).as("__days"))
    perUser
      .select(col("cohort_day"), explode(array_distinct(
        transform(col("__days"), d =>
          intDiv(datediff(d, col("cohort_day")).cast("long"),
            lit(bucketDays.toLong))))).as("bucket_offset"))
      .groupBy(col("cohort_day"), col("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("bucket_offset"))
  }
}
