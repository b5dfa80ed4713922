package graft.queries

/** Per-query budgets for PARTITION-LESS window operators — the round-12
  * verdict's "one plan class with no standing gate".
  *
  * A `Window` with an empty (or all-foldable) partition spec executes as
  * a SINGLE task holding the whole input: fine over a tiny-by-construction
  * frame (per-stratum counts, cuts histograms, feasibility minima), fatal
  * over anything corpus-sized at 100 TB. Spark warns ("No Partition
  * Defined for Window") but the deliberate tiny-frame sites drown the
  * signal — `Verify` on llm_select_full alone emits 38 of them — so a
  * NEW corpus-sized global window could ship inside the noise. This
  * registry turns the warning into a ratchet in the [[ScanBudgets]]
  * mold.
  *
  * Semantics: a declared query's optimized logical plan (subqueries
  * included) may contain at most `budget(name)` partition-less Window
  * nodes; the default is ZERO. Every exception below names the site and
  * says WHY its frame is bounded — entries are RATCHETS (measured at
  * gate-landing time, lower-only; a fixed shape must drop its entry in
  * the same commit).
  *
  * Known blind spot, shared with the plan-side scan gate: windows below
  * a lazy `localCheckpoint` cut are invisible (the plan truncates at the
  * RDD cut). All current cut stages are pair/candidate-sized and build
  * their windows through the same audited helpers; the executed-scan
  * gate bounds their cost story.
  *
  * Enforced by `graft.plans.WindowBudgetSpec` at sf0.001.
  */
object WindowBudgets {
  /** Max partition-less logical Window nodes per declared query plan. */
  val default: Int = 0

  /** query -> (budget, why the windowed frame is tiny-by-construction).
    * Measured 2026-08-14 at gate landing; every site inspected. */
  val perQuery: Map[String, (Int, String)] = Map(
    "llm_adaptive_gate" -> (1 ->
      "discreteCuts CDF over the n_tokens HISTOGRAM (value-domain-sized by groupBy, checkpoint-cut; TextStats.discreteCuts)"),
    "llm_quality_tiers" -> (1 ->
      "discreteCuts CDF over the qualityBp histogram — score domain is basis points, <= 10^4+1 rows (TextStats.qualityTiers)"),
    "llm_dsir" -> (1 ->
      "bucket-CDF over the DSIR hash histogram, driver-capped at 2^20 buckets by require (TextStats.dsirDist)"),
    "llm_unimax" -> (2 ->
      "water-filling rank + prefix-sum over the per-stratum strata frame, <= |strata| rows by groupBy, checkpoint-cut (Sampling.unimax w1)"),
    "llm_reweight" -> (1 ->
      "reweightBy feasibility min over the per-stratum counts frame, <= |target| rows (Sampling.scala:388-400)"),
    "llm_reweight_tokens" -> (1 ->
      "reweightBy feasibility min over the per-stratum counts frame, <= |target| rows (Sampling.scala:388-400)"),
    "llm_assemble" -> (1 ->
      "assemble composes reweightBy — same feasibility-min window over the counts frame (Sampling.scala:388-400)"),
    "llm_hybrid_rank" -> (2 ->
      "lexical and dense rank windows each run over a post-TakeOrdered frame of <= 20 rows (the producers' limits); the corpus-sized stages are windowless"))
  // Known off-plan site (the blind-spot class above): agg_quantile_merge's
  // Aggs.discreteRankPass (r21) runs a partition-less cumulative window
  // over the o_totalprice VALUE HISTOGRAM inside an eager internal
  // action (head()), so the declared plan never carries it. Not tiny —
  // the exact-percentile contract is inherently value-domain-sized —
  // but it REPLACED three percentile_disc buffers each holding the same
  // domain in one final-agg task (guide §5); the equivalence is pinned
  // in QuantileSketchSpec.

  def budget(name: String): Int =
    perQuery.get(name).map(_._1).getOrElse(default)
}
