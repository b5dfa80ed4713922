package graft.llm

import graft.functions.VectorFunctions.intDiv
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout — Z-order (Morton) clustering for
  * data-skipping scans. A 100 TB corpus is read far more often than it
  * is written, and readers filter on MORE THAN ONE dimension (language
  * AND length band, source AND quality tier); a single-column sort gives
  * parquet min/max pruning on that column only, while interleaving the
  * bits of two bounded dimensions and range-sorting on the interleaved
  * value keeps BOTH dimensions locally clustered — every shard covers a
  * small rectangle of (a, b) space, so row-group min/max statistics
  * prune scans filtered on either column (the technique behind
  * Delta/Iceberg `ZORDER BY`, Morton 1966).
  *
  * Everything is integer bit arithmetic on bounded inputs — engine-exact
  * and oracle-able; the DuckDB side of the bit-interleave is GENERATED
  * from the same per-bit term list ([[mortonSql]]), so the two engines
  * replay one formula.
  */
object Layout {

  private def checkBits(bits: Int): Unit =
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  /** Morton-interleave two `bits`-bit non-negative integers: bit i of
    * `a` lands at result bit 2i, bit i of `b` at 2i+1. Composed from
    * Catalyst's native bit built-ins — shift/AND/OR stay inside
    * whole-stage codegen, and constant-folding collapses the literal
    * masks. The projection is 2·bits terms wide; at the layout sweet
    * spot (8–14 bits per dimension — finer than a shard's rectangle
    * resolves is wasted) that is well inside the ~100-expression codegen
    * ceiling (CLAUDE.md). Inputs are the caller's responsibility to
    * bound (see [[zOrder]]'s clamp). */
  def mortonColumn(a: Column, b: Column, bits: Int): Column = {
    checkBits(bits)
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** The same interleave as [[mortonColumn]], as an ANSI SQL expression
    * over column expressions `a` and `b` — generated from the identical
    * per-bit loop so an oracle engine replays the formula term for
    * term. */
  def mortonSql(a: String, b: String, bits: Int): String = {
    checkBits(bits)
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Z-order the frame by dimensions (`a`, `b`) and lay it out into
    * shards of `rowsPerShard` rows: adds `z_value` (the Morton code of
    * the clamped dimensions), `shard_id` and `pos_in_shard`. Dimension
    * values are clamped into [0, 2^bits) — out-of-range values cluster
    * at the edge rather than aliasing across the space (masking would
    * put 2^bits and 0 in the same cell). A NULL dimension value is
    * treated as 0 (explicit coalesce): null-dimension rows cluster at
    * the origin cell and carry no skipping signal on that dimension —
    * if NULLs are frequent, derive a real sentinel value upstream
    * (e.g. a "missing" band) instead of letting them pile up at (0, _).
    *
    * Plan shape (100 TB): identical to [[Packing.shuffleShards]] — ONE
    * range-sort exchange on (z_value, id) plus
    * [[graft.core.Positional]]'s two-pass offset index (per-partition
    * counts + narrow add, NO single-partition window); the shard
    * arithmetic is a narrow projection. Writing shards via
    * [[graft.sources.Sinks.trainingShards]] then gives every shard file
    * a tight (a, b) bounding rectangle, which is the entire point:
    * a reader filtering on either dimension partition-prunes. */
  def zOrder(df: DataFrame, a: Column, b: Column, bits: Int,
             rowsPerShard: Long, idCol: String = "doc_id"): DataFrame = {
    checkBits(bits)
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    require(!df.columns.exists(Seq("z_value", "shard_id", "pos_in_shard").contains),
      "zOrder writes z_value/shard_id/pos_in_shard; input already has one — rename it first")
    val maxV = lit((1L << bits) - 1)
    def clamp(c: Column): Column =
      least(greatest(coalesce(c.cast("long"), lit(0L)), lit(0L)), maxV)
    val withZ = df.withColumn("z_value", mortonColumn(clamp(a), clamp(b), bits))
    val indexed = graft.core.Positional.zipWithIndex(withZ,
      Seq(col("z_value"), col(idCol)), "__pos")
    indexed.select(withZ.columns.map(col) ++ Seq(
      intDiv(col("__pos"), lit(rowsPerShard)).as("shard_id"),
      (col("__pos") - intDiv(col("__pos"), lit(rowsPerShard)) * rowsPerShard)
        .as("pos_in_shard")): _*)
  }
}
