package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Constructor shim: CollectTopK is private[aggregate], so the bounded-heap
  * top-k collector is exposed to the engine from inside its own package. */
object GraftCollectTopK {
  def apply(e: Expression, k: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(e, k, reverse)
}
