package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Release the block-backed RDD behind a `localCheckpoint`ed frame NOW,
    * instead of waiting for a GC cycle plus the ContextCleaner to notice
    * the frame is unreachable: collect the plan's `LogicalRDD` leaves and
    * unpersist them (non-blocking). In a long-lived session (Bench runs
    * ~40 queries after a curation pass) the lag between "superseded" and
    * "collected" keeps dead MEMORY_AND_DISK blocks competing with live
    * queries for executor memory. Call ONLY on frames whose checkpoint is
    * superseded — the blocks have no lineage, so any later action on the
    * frame fails instead of recomputing. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** BATCH execution of `transformWithState` loads a real state store,
    * which needs the driver's StateStoreCoordinator RPC endpoint — an
    * endpoint streaming queries create lazily via the query manager.
    * Touch the same lazy ref (`private[sql]`) so a batch run works
    * without a streaming query having started first. Idempotent. */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .streams.stateStoreCoordinator
    ()
  }

  /** Drain the async listener bus (`private[spark]`) — test harnesses
    * counting scan RDDs via a SparkListener must flush pending events
    * before reading their counters. */
  def waitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** `internalCreateDataFrame` is `private[sql]`: build a DataFrame straight
    * from `RDD[InternalRow]` with no Row round-trip — used by the positional
    * ops to re-enter Catalyst after an RDD `zipWithIndex`. Rows MUST be
    * immutable (copied) — downstream operators may buffer them. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
