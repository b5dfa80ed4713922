package graft.plans

import graft.SparkSpec
import graft.queries.ExchangeBudgets

/** The standing executed-shuffle regression gate (round-12 verdict item
  * 2). EVERY declared query runs to a noop sink at sf0.001 with a
  * listener counting the distinct shuffle RDDs the action materializes
  * (builder jobs included — reset happens BEFORE the frame is built, so
  * k-means/bloom/CC builder shuffles are part of a query's cost, same
  * protocol as the executed half of [[ScanBudgetSpec]]). Counts must
  * stay within [[ExchangeBudgets]] — ratchets pinned to measured
  * actuals, lower-only.
  */
class ExchangeBudgetSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir missing")

  test("every declared query stays within its executed-shuffle budget") {
    val counter = new DistinctRddListener(Set("ShuffledRowRDD", "ShuffledRDD"))
    spark.sparkContext.addSparkListener(counter)
    try {
      val over = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          counter.reset()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          org.apache.spark.sql.graftbridge.ColumnBridge.waitListenerBus(spark)
          val n = counter.count
          val b = ExchangeBudgets.budget(name)
          info(s"$name: $n executed shuffles (budget $b)")
          if (n > b) List(s"$name: $n executed shuffles > budget $b") else Nil
      }
      withClue(over.mkString("\n")) { over shouldBe empty }
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("shuffle-budget exceptions only name declared queries (no stale ratchets)") {
    ExchangeBudgets.perQuery.keySet
      .diff(graft.SparkEntry.queries.keySet) shouldBe empty
  }
}
