package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Window
import graft.SparkSpec
import graft.queries.WindowBudgets

/** The standing partition-less-window regression gate (round-12 verdict
  * item 1). For EVERY declared query, walks the optimized logical plan
  * (subqueries included) and counts `Window` nodes whose partition spec
  * is empty or all-foldable — the single-task global-window shape that
  * is only acceptable over tiny-by-construction frames. Counts must stay
  * within [[WindowBudgets]]; the whitelist documents why each remaining
  * site is bounded. Plan-only, like the plan half of [[ScanBudgetSpec]].
  */
class WindowBudgetSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir missing")

  private def globalWindows(name: String): Int =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.optimizedPlan.collectWithSubqueries {
        case w: Window if w.partitionSpec.forall(_.foldable) => w
      }.size

  test("every declared query stays within its partition-less-window budget") {
    val failures = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = globalWindows(name)
      if (n > 0) info(s"$name: $n partition-less windows (budget ${WindowBudgets.budget(name)})")
      if (n > WindowBudgets.budget(name))
        List(s"$name: $n partition-less Window nodes > budget ${WindowBudgets.budget(name)}")
      else Nil
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
  }

  test("window whitelist only names declared queries that still need it") {
    val declared = graft.SparkEntry.queries.keySet
    WindowBudgets.perQuery.keySet.diff(declared) shouldBe empty
    // no stale entries: a whitelisted query with zero partition-less
    // windows must drop its entry (the lower-only ratchet contract)
    val stale = WindowBudgets.perQuery.keys.filter(globalWindows(_) == 0)
    withClue(s"stale whitelist entries: ${stale.mkString(", ")}") {
      stale shouldBe empty
    }
  }
}
