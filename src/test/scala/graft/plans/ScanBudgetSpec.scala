package graft.plans

import graft.SparkSpec
import graft.queries.ScanBudgets

/** The standing scan-count regression gate (round-10 verdict item 3).
  *
  * For EVERY declared query, formats the physical plan at sf0.001 and
  * asserts the number of `Scan parquet` operators per distinct table is
  * within [[ScanBudgets]] — the multi-consumer re-scan class (a frame
  * feeding N consumers re-derives its lineage N times per action; at
  * 100 TB each extra scan is a full corpus read) was caught by hand in
  * rounds 8, 9, and 10; this spec makes reintroducing it a test failure.
  *
  * Plan-only: frames are built and explained, never executed (builders
  * with driver-side plan objects — codebooks, BPE vocabs — do run their
  * bounded collect jobs, same as `graft.Explain`). Budgets are ratchets;
  * see the ScanBudgets scaladoc for the lower-don't-raise contract.
  */
class ScanBudgetSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // "(12) Scan parquet" then attribute lines, one of which is
  // "Location: InMemoryFileIndex [file:/...]" — formatted mode prints
  // each operator once (ReusedExchange/ReusedSubquery reference, not
  // duplicate), so the count is the count of distinct scan operators.
  private val opHeader = raw"\((\d+)\) Scan parquet.*".r
  private val location = raw"Location: \S+ \[([^\]]*)\]".r

  /** table-basename -> number of Scan parquet operators reading it */
  private def scansPerTable(formatted: String): Map[String, Int] = {
    val lines = formatted.linesIterator.toVector
    val tables = Vector.newBuilder[String]
    var inScan = false
    for (l <- lines) {
      val t = l.trim
      t match {
        case opHeader(_)     => inScan = true
        case _ if t.matches(raw"\(\d+\) .*") => inScan = false
        case location(paths) if inScan =>
          tables += paths.split(",").head.trim.stripSuffix("/").split("/").last
          inScan = false
        case _ => ()
      }
    }
    tables.result().groupBy(identity).map { case (k, v) => (k, v.size) }
  }

  assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir missing")

  test("every declared query stays within its per-table parquet-scan budget") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val over = scansPerTable(plan).filter(_._2 > ScanBudgets.budget(name))
        if (over.isEmpty) Nil
        else List(s"$name: $over exceeds budget ${ScanBudgets.budget(name)}")
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
  }

  test("budget exceptions only name declared queries (no stale ratchets)") {
    val declared = graft.SparkEntry.queries.keySet
    (ScanBudgets.perQuery.keySet ++ ScanBudgets.executedPerQuery.keySet)
      .diff(declared) shouldBe empty
  }

  // The EXECUTED-scan assertions (total across all queries since r13,
  // checkpoint-cut and builder-driven ones included) live in
  // ExchangeBudgetSpec — one noop-sink execution sweep serves both the
  // shuffle and the executed-scan gate.
}
