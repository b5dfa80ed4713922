package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — the conversion
  * measurement (view → click → purchase) every event-analytics surface
  * ships: per user, how deep into an ordered step sequence does the
  * time-sorted stream get, where each step after the first must land
  * within `maxGapUs` of the previously matched step?
  *
  * Semantics are the GREEDY-EARLIEST fold (the streaming-funnel
  * standard): walk the user's events in (ts, tie) order and advance the
  * state on the first event matching the next step inside the gap.
  * Greedy-earliest is deterministic and one-pass; it is NOT the
  * maximal-completion search (a later step-1 match could complete when
  * the earliest one times out) — deployments wanting windowed-maximal
  * run this per candidate window. Declared, not hidden.
  *
  * Shape for 100 TB: ONE user-keyed exchange (the sorted collect_list —
  * the §2.9-bis sorted-collect discipline makes the fold input
  * deterministic under any partitioning), then a per-user `aggregate`
  * fold over the event structs — no window, no self-join, no
  * per-step pass (a k-step funnel as k as-of joins would be k corpus
  * shuffles). The fold body is a HOF lambda (interpreted — per-user
  * lists, never corpus-wide arrays); timestamps travel as epoch
  * MICROSECONDS (`unix_micros` ↔ DuckDB `epoch_us` — the exact lane;
  * second-truncating casts differ across engines on fractional ts).
  *
  * Emits one row per user: `(userCol, steps_completed, completed_ts_us)`
  * — the last column is the completion timestamp when the full funnel
  * closed, else NULL. ORDER BY user. */
object Funnel {

  def funnel(events: DataFrame, steps: Seq[String], maxGapUs: Long,
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             tieCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"duplicate steps not supported (greedy state is a single index): $steps")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    // the tie column must stay total-order-deterministic: a blind
    // cast("long") turns a non-numeric id into NULL and silently
    // collapses the documented tie order into struct-null ordering —
    // numeric ids cast exactly, string ids hash (xxhash64 is
    // deterministic), anything else is a caller error
    val tie = events.schema(tieCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        col(tieCol).cast("long")
      case org.apache.spark.sql.types.StringType => xxhash64(col(tieCol))
      case other => throw new IllegalArgumentException(
        s"tie column '$tieCol' must be numeric or string, got ${other.simpleString}")
    }
    val n = steps.length
    val stepArr = typedLit(steps)
    val ordered = events.select(col(userCol),
        struct(unix_micros(col(tsCol)).as("ts"),
          tie.as("tie"),
          col(typeCol).as("tp")).as("e"))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
    val init = struct(lit(0).as("k"), lit(0L).as("ts"))
    def step(s: Column, x: Column): Column =
      when(s.getField("k") < n &&
          x.getField("tp") === element_at(stepArr, s.getField("k") + 1) &&
          (s.getField("k") === 0 ||
            x.getField("ts") - s.getField("ts") <= maxGapUs),
        struct((s.getField("k") + 1).as("k"), x.getField("ts").as("ts")))
        .otherwise(s)
    val folded = aggregate(col("evs"), init, step)
    ordered.select(col(userCol),
        folded.getField("k").cast("long").as("steps_completed"),
        when(folded.getField("k") === n, folded.getField("ts"))
          .as("completed_ts_us"))
      .orderBy(col(userCol))
  }
}
