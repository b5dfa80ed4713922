package graft.queries

/** Per-query parquet-scan budgets — the standing regression gate for the
  * multi-consumer re-scan class (caught by hand in r8, r9, and r10;
  * automated in r11 per the round-10 verdict).
  *
  * Semantics: for every declared query, the FORMATTED physical plan may
  * contain at most `budget(name)` `Scan parquet` operators **per distinct
  * table**. The default is 2 — a self-join/union/zip of a table with
  * itself inherently plans two scans, and the near-dup verify shape's
  * "signature pass + candidate-pruned text pass" is the documented
  * 100 TB-correct two-read plan. Anything above 2 means some frame feeds
  * multiple consumers without a cut and re-derives the corpus per
  * consumer — at 100 TB each extra count is a full corpus read.
  *
  * The per-query entries below are RATCHETS, not endorsements: each is
  * the measured count at the time the gate landed, committed so the
  * number can never silently grow, and to be driven DOWN as the shapes
  * get the checkpoint-cut treatment. A fixed query's entry must be
  * lowered (or deleted) in the same commit as the fix — the gate fails
  * on regression, the ledger records progress.
  *
  * Enforced by `graft.plans.ScanBudgetSpec` over every
  * [[graft.SparkEntry.queries]] entry at sf0.001.
  */
object ScanBudgets {
  /** Max `Scan parquet` operators per distinct table in one query plan. */
  val default: Int = 2

  /** Ratcheted exceptions, measured 2026-08-14 (round 11 gate landing). */
  val perQuery: Map[String, Int] = Map(
    "llm_assemble"             -> 6,
    "llm_contamination"        -> 3,
    "llm_contamination_report" -> 4,
    "llm_contamination_sweep"  -> 3,
    "llm_corpus_diff"          -> 3,
    "llm_curate"               -> 4,
    "llm_dedup_budget"         -> 3,
    "llm_dedup_embed"          -> 3,
    "llm_dedup_ngram"          -> 7,
    "llm_dedup_paragraph"      -> 3,
    "llm_dedup_substring"      -> 3,
    "llm_domain_boilerplate"   -> 4,
    "llm_dup_mass"             -> 4,
    "llm_ingest"               -> 10,
    "llm_ivf_pq"               -> 4,
    "llm_pq_persist"           -> 3,
    "llm_quality_dedup"        -> 3,
    "llm_reweight"             -> 3,
    "llm_reweight_tokens"      -> 3,
    "llm_split_leakage"        -> 3
  )

  def budget(query: String): Int = perQuery.getOrElse(query, default)
}
