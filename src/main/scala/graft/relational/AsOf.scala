package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the time-series companion to the
  * bucketized range join (SURVEY §2.3 J6; not in the reference, which has
  * no temporal join at all — capability closed beyond it, like §2.6).
  *
  * For every left row, attach the single most recent right row whose
  * `timeCol` is ≤ the left row's (backward-inclusive), within the same
  * `keys` group; left rows with no prior right row get nulls.
  *
  * Scale design (100 TB): the naive formulation is a range theta-join
  * (`r.ts <= l.ts`) — a nested-loop O(n·m) pass. Here both sides are
  * tagged and UNIONed, then a running `last(ignoreNulls)` window over
  * (keys; time, tag) carries the latest right payload forward into each
  * left row: ONE hash-partitioned shuffle on the join keys, linear scan
  * within partitions, no candidate blow-up and no time-bucket tuning.
  * The right payload travels as a single struct so all attached columns
  * always come from the SAME right row.
  *
  * Determinism: right rows must be unique per (keys, timeCol) — dedup
  * upstream (e.g. `groupBy(keys, ts).agg(max_by(...))`); ties between a
  * left and right row at the same instant resolve to the right row
  * (inclusive), matching DuckDB/pandas `ASOF JOIN` semantics.
  */
object AsOf {

  /** @param maxGap optional staleness bound (pandas `merge_asof`
    *   tolerance): a match is kept only while
    *   `left.timeCol − matched right.timeCol ≤ maxGap` — pass an interval
    *   literal for timestamps (`expr("INTERVAL 10 MINUTES")`) or a numeric
    *   for numeric time columns; stale matches become nulls, exactly as if
    *   no right row existed. Evaluated per row AFTER the window fill, so
    *   the plan is unchanged — still one shuffle. */
  def joinAsOf(left: DataFrame, right: DataFrame,
               timeCol: String, keys: Seq[String],
               rightCols: Seq[String],
               maxGap: Option[Column] = None): DataFrame = {
    // an empty key set would make the window partition-less — one task
    // fills every row of both sides, the exact single-partition global
    // window this operator's design exists to avoid; a genuine global
    // as-of join must say so explicitly with a constant key
    require(keys.nonEmpty,
      "joinAsOf needs at least one key; for a global as-of join add an explicit constant key column")
    val overlap = rightCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"right payload columns collide with left columns: ${overlap.mkString(", ")} — alias them first")
    require(!rightCols.contains("__ts"), "__ts is reserved in the as-of payload")
    // fail fast instead of silently overwriting via withColumn below
    Seq("__asof", "__tag").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"$c is reserved by joinAsOf — rename that input column first")
    }
    val lCols = left.columns.toSeq
    // the matched right row's own time rides in the payload as __ts so the
    // staleness bound can be evaluated after the fill
    def payload(r: DataFrame): Column =
      struct((rightCols.map(col) :+ col(timeCol).as("__ts")): _*)
    val payloadType = right.select(payload(right).as("__asof"))
      .schema("__asof").dataType
    val l = left
      .withColumn("__asof", lit(null).cast(payloadType))
      .withColumn("__tag", lit(1))
    val r = right.select(
      lCols.map(c =>
        if (keys.contains(c) || c == timeCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(payload(right).as("__asof"), lit(0).as("__tag")): _*)
    // tag 0 < 1 orders a right row BEFORE a left row at the same instant →
    // backward-INCLUSIVE match; ignoreNulls skips the left rows' null
    // payloads so only genuine right rows fill forward.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    val bounded = maxGap match {
      case Some(g) => filled.withColumn("__asof",
        when(col("__asof").isNotNull &&
          (col(timeCol) - col("__asof.__ts")) <= g, col("__asof")))
      case None => filled
    }
    bounded
      .where(col("__tag") === 1)
      .select(lCols.map(col) ++ rightCols.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
