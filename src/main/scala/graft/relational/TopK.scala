package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.{Column, DataFrame}

/** Top-k rows per group WITHOUT a window sort.
  *
  * The window formulation (`row_number().over(partitionBy(keys).orderBy(o))
  * <= k`) materializes and fully sorts every partition before discarding
  * all but k rows. This operator instead aggregates with Spark's internal
  * bounded-heap collector (`CollectTopK`): each map task keeps at most k
  * rows per key, partial buffers merge pairwise, and the shuffle moves
  * k·keys rows instead of everything — the difference between sort-all and
  * heap-k at 100 TB group sizes.
  *
  * `sortCols` define the struct ordering, ascending, compared field by
  * field — encode descending numerics by negation and put a unique
  * tiebreaker before any payload fields so results are deterministic.
  */
object TopK {

  def topKPerGroup(df: DataFrame, keys: Seq[Column], sortCols: Seq[Column],
                   k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.exists(Seq("__topk", "__row").contains),
      "topKPerGroup uses __topk/__row working columns; input already has one — rename it first")
    val sortStruct = struct(sortCols: _*)
    // CollectTopK(reverse = true) keeps the k SMALLEST under struct order
    val collect = ColumnBridge.collectTopK(
      ColumnBridge.expression(sortStruct), k, reverse = true)
    df.groupBy(keys: _*)
      .agg(collect.as("__topk"))
      .withColumn("__row", explode(col("__topk")))
      .select(col("*"), col("__row.*"))
      .drop("__topk", "__row")
  }

  /** Like [[topKPerGroup]] but also emits a 1-based rank per group (the
    * row_number() the window formulation would produce). The collected
    * k-element array is sorted before posexplode — O(k log k) per group,
    * not a partition sort. */
  def topKPerGroupRanked(df: DataFrame, keys: Seq[Column], sortCols: Seq[Column],
                         k: Int, rankCol: String): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains(rankCol),
      s"topKPerGroupRanked writes '$rankCol'; input already has it — pick another rankCol")
    require(!df.columns.exists(Seq("__topk", "__pos", "__row").contains),
      "topKPerGroupRanked uses __topk/__pos/__row working columns; input already has one — rename it first")
    val sortStruct = struct(sortCols: _*)
    val collect = ColumnBridge.collectTopK(
      ColumnBridge.expression(sortStruct), k, reverse = true)
    df.groupBy(keys: _*)
      .agg(array_sort(collect).as("__topk"))
      .select(col("*"), posexplode(col("__topk")).as(Seq("__pos", "__row")))
      .select(col("*"), col("__row.*"))
      .withColumn(rankCol, (col("__pos") + 1).cast("long"))
      .drop("__topk", "__pos", "__row")
  }
}
