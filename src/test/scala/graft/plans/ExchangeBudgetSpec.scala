package graft.plans

import graft.SparkSpec
import graft.queries.ExchangeBudgets

import graft.queries.ScanBudgets

/** The standing EXECUTED-cost regression gates (round-12 verdict item
  * 2, extended round 13). EVERY declared query runs to a noop sink at
  * sf0.001 ONCE, under a listener counting both cost classes the
  * action materializes:
  *
  *   - distinct shuffle RDDs (`ShuffledRowRDD`/`ShuffledRDD`) vs
  *     [[ExchangeBudgets]];
  *   - distinct `FileScanRDD`s vs [[ScanBudgets.executedBudget]] —
  *     TOTAL gate coverage since r13: the plan-side scan gate is blind
  *     past checkpoint cuts AND to eager builder jobs (a k-means
  *     trainer's collect scans never appear in the declared frame's
  *     plan), so the executed count is asserted for all queries, not
  *     just the checkpoint-cut ones.
  *
  * Builder jobs are included — reset happens BEFORE the frame is
  * built, so trainer/bloom/CC builder work is part of a query's cost.
  * All numbers are ratchets pinned to measured actuals, lower-only.
  */
class ExchangeBudgetSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir missing")

  test("every declared query stays within its executed shuffle AND scan budgets") {
    val counter = new DistinctRddListener(
      Set("ShuffledRowRDD", "ShuffledRDD", "FileScanRDD"))
    spark.sparkContext.addSparkListener(counter)
    try {
      val over = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          counter.reset()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          org.apache.spark.sql.graftbridge.ColumnBridge.waitListenerBus(spark)
          val nSh = counter.countOf("ShuffledRowRDD", "ShuffledRDD")
          val bSh = ExchangeBudgets.budget(name)
          val nSc = counter.countOf("FileScanRDD")
          val bSc = ScanBudgets.executedBudget(name)
          info(s"$name: $nSh executed shuffles (budget $bSh), $nSc executed scans (budget $bSc)")
          (if (nSh > bSh) List(s"$name: $nSh executed shuffles > budget $bSh") else Nil) ++
            (if (nSc > bSc) List(s"$name: $nSc executed scans > budget $bSc") else Nil)
      }
      withClue(over.mkString("\n")) { over shouldBe empty }
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("shuffle-budget exceptions only name declared queries (no stale ratchets)") {
    ExchangeBudgets.perQuery.keySet
      .diff(graft.SparkEntry.queries.keySet) shouldBe empty
  }
}
