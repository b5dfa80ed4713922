package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 optimization-round dev tool: formatted plans for the OFF-PLAN
  * internal actions the round touched — work that graft.Explain cannot
  * show because the declared query returns a driver-collected
  * LocalRelation (agg_quantile_merge) or runs a disk lifecycle
  * (llm_dedup_stream). Output is committed under plans/r21/.
  *
  * Usage: runMain graft.PlansR21 <sfDir> <face>
  *   quantile_before — the old triple-percentile_disc exact pass
  *   quantile_after  — Aggs.discreteRankPass's histogram + window shape
  */
object PlansR21 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val face = args.lift(1).getOrElse("quantile_after")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.model.Tables.orders(spark, sf)
    val qsBp = Seq(2500L, 5000L, 9000L)
    val ests = Seq(50000.0, 130000.0, 250000.0) // plan shape only
    face match {
      case "quantile_before" =>
        val rankAggs: Seq[org.apache.spark.sql.Column] =
          Seq(count(lit(1)).cast("long").as("n")) ++
            qsBp.indices.flatMap { i =>
              Seq(sum(when(col("o_totalprice") < ests(i), 1L).otherwise(0L))
                  .cast("long").as(s"lo$i"),
                sum(when(col("o_totalprice") <= ests(i), 1L).otherwise(0L))
                  .cast("long").as(s"hi$i"))
            } ++
            qsBp.zipWithIndex.map { case (q, i) =>
              expr(s"percentile_disc(0.${"%04d".format(q)}) WITHIN GROUP " +
                "(ORDER BY o_totalprice)").as(s"d$i")
            }
        orders.agg(rankAggs.head, rankAggs.tail: _*).explain("formatted")
      case "quantile_after" =>
        val w = org.apache.spark.sql.expressions.Window.orderBy("v")
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        val cum = orders.select("o_totalprice")
          .groupBy(col("o_totalprice").as("v"))
          .agg(count(lit(1)).as("c"))
          .select(col("v"), sum(col("c")).over(w).as("cum"))
        val rks = Seq(38L, 75L, 135L)
        val aggs = Seq(max(col("cum")).cast("long").as("n")) ++
          ests.indices.flatMap { i =>
            Seq(coalesce(max(when(col("v") < ests(i), col("cum"))), lit(0L))
                .cast("long").as(s"lo$i"),
              coalesce(max(when(col("v") <= ests(i), col("cum"))), lit(0L))
                .cast("long").as(s"hi$i"),
              min(when(col("cum") >= rks(i), col("v")))
                .cast("double").as(s"d$i"))
          }
        cum.agg(aggs.head, aggs.tail: _*).explain("formatted")
      case other => sys.error(s"unknown face: $other")
    }
    spark.stop()
  }
}
