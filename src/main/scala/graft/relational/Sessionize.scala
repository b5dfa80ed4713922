package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gap-based session assignment every
  * event-analytics pipeline runs before session-level metrics (and the
  * BATCH twin of the streaming `session_window` face, which holds only
  * state-store-sized session state; this one replays history): a new
  * session starts at a user's first event and at every event more than
  * `gapUs` after its predecessor.
  *
  * Shape: the break flags (lag) and the running session index
  * (cumulative sum) are windows over the SAME (user, (ts, tie))
  * partitioning, and the per-session rollup's (user, session) keys are
  * co-located by that same user-hash distribution — so the WHOLE
  * operator is ONE exchange (spec-pinned; the chat_pack discipline
  * carried one step further). Timestamps in epoch micros (the exact
  * lane).
  * Deterministic: ties order by `tieCol`. Emits one row per session:
  * `(userCol, session_idx, n_events, start_us, end_us, duration_us)`,
  * session_idx 1-based per user in time order; ORDER BY user, idx. */
object Sessionize {

  def sessionize(events: DataFrame, gapUs: Long,
                 userCol: String = "user_id", tsCol: String = "ts",
                 tieCol: String = "event_id"): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__ts"), col("__tie"))
    val brk = events.select(col(userCol),
        unix_micros(col(tsCol)).as("__ts"),
        col(tieCol).cast("long").as("__tie"))
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull || col("__ts") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__brk")).over(w))
    brk.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts")).as("start_us"),
        max(col("__ts")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy(col(userCol), col("session_idx"))
  }
}
