package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-column dataset profiler — the datasheet header every ingested
  * table gets before anything else runs (row counts, null rates,
  * cardinalities, value ranges): the engine-native analog of
  * `DataFrame.summary()`, but integer/string-exact where summary is
  * floating, cardinality-aware where summary is not, and emitted as
  * ROWS (one per column) so the profile itself is a queryable,
  * diffable table (the corpus_report discipline applied to schema).
  *
  * Shape for 100 TB: ONE scan, ONE global aggregation — every
  * statistic is algebraic or sketch-mergeable, so partials combine
  * map-side and a single 1-row frame crosses the shuffle; the
  * per-column rows are exploded from that one row driver-free (the
  * Classifier.sweep wide-aggregate pattern). Distinct counts are HLL
  * estimates (`approx_count_distinct`, rsd 2 %) — the exact form is
  * one full exchange PER COLUMN (Spark expands multi-distinct
  * aggregates), which is exactly the cost a 100 TB profile cannot pay;
  * the oracle-gated query face joins the estimate against the exact
  * count and gates the 5 % contract instead of the value (the
  * agg_approx discipline). Min/max travel as strings so one schema
  * carries every column type; BIGINT→string casts are identical across
  * engines (timestamps/doubles need caller-side canonicalization —
  * profile the derived string column instead).
  */
object Profile {

  /** One row per profiled column: `(col_name, n_rows, n_nulls, min_val,
    * max_val, distinct_est)`, ordered by column name. (`col_name`, not
    * `column` — reserved in ANSI engines, the bare-alias trap.) */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val sorted = cols.sorted
    val aggs = count(lit(1)).as("__n") +: sorted.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        approx_count_distinct(col(c), 0.02).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = sorted.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - coalesce(col(s"__cnt_$c"), lit(0L))).as("n_nulls"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"),
        coalesce(col(s"__d_$c"), lit(0L)).as("distinct_est"))
    }
    wide.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_name"), col("__r.n_rows"), col("__r.n_nulls"),
        col("__r.min_val"), col("__r.max_val"), col("__r.distinct_est"))
  }
}
