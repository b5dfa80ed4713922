package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-versioning audit ops (training-data pipeline mandate; no analog
  * in the reference). A 100 TB corpus is rebuilt, refreshed and patched
  * continuously — the audit trail of WHAT changed between two snapshots
  * is what makes a training-data release reviewable.
  */
object Audit {

  /** Snapshot diff — per-document status between two corpus versions:
    * `added` (id only in `next`), `removed` (id only in `prev`),
    * `changed` (both, content hash differs), `unchanged` (both, same
    * hash). Content comparison is by sha2-256 — the [[Dedup.exact]]
    * discipline — so "changed" means the BYTES changed, not the id.
    *
    * Plan shape (100 TB): each side reduces to `(id, 32-byte hash)` in a
    * narrow projection before the join, so the full-outer join — the one
    * unavoidable exchange of a diff — shuffles fixed-width rows, never
    * text. With both snapshots stored bucketed-and-sorted by `idCol`
    * (the natural layout for versioned corpora), the sort-merge join
    * runs exchange-free. The status projection is narrow; downstream
    * accounting (`groupBy(status).count()`) map-side combines. */
  def corpusDiff(prev: DataFrame, next: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // presence is tested on explicit markers, NOT hash nullness: sha2 of a
    // NULL text is NULL, and a null-text row present in both snapshots
    // must read 'unchanged' (null-safe hash compare), not 'added'
    val p = prev.select(col(idCol).as("__id"), lit(true).as("__inp"),
      sha2(col(textCol), 256).as("__ph"))
    val n = next.select(col(idCol).as("__id"), lit(true).as("__inn"),
      sha2(col(textCol), 256).as("__nh"))
    p.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__inp").isNull, "added")
          .when(col("__inn").isNull, "removed")
          .when(!(col("__ph") <=> col("__nh")), "changed")
          .otherwise("unchanged").as("status"))
  }
}
