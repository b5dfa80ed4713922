package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported pattern for libraries shipping custom Catalyst expressions
  * against the classic (non-Connect) Spark runtime.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Bounded-heap top-k collector (private[aggregate] in Spark) as an
    * aggregate Column: keeps the k LARGEST values of `e` under its natural
    * ordering (`reverse = true` for the k smallest), with map-side partial
    * merge. */
  def collectTopK(e: Expression, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectTopK(e, k, reverse)
        .toAggregateExpression())
}
