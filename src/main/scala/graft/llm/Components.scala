package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair graph — the step that turns
  * pairwise near-dup output ([[Dedup.minHashNearDups]] / simHash / ngram
  * verify) into KEEP/DROP decisions: docs A~B and B~C must land in ONE
  * cluster with one elected representative, even though (A,C) was never
  * emitted as a pair. (Reference scope: trembita's groupBy covers only
  * single-key grouping; transitive closure is new surface mandated by the
  * LLM-pipeline tier — cf. the connected-components formulation in
  * "Connected Components in MapReduce and Beyond", Kiveris et al. 2014.)
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING —
  * each round every node takes the min label over {itself} ∪ neighbours
  * (one shuffle keyed by node id, min combines map-side), then follows
  * its label's label (`comp ← comp(comp)`, one self-join). Jumping halves
  * label-chain depth each round, so convergence is O(log diameter)
  * rounds, not O(diameter) — dup clusters are near-cliques (diameter
  * 2–3), and even pathological chain-shaped clusters of 2^20 docs close
  * in ~20 rounds. Every round ends in a localCheckpoint: an iterative
  * DataFrame loop otherwise doubles its logical plan per round (analysis
  * time blows up long before the data does); the checkpoint is lazy and
  * materializes under the round's single action — the changed-label
  * count that doubles as the convergence test — and the superseded
  * round's checkpoint blocks are released EXPLICITLY the moment the new
  * round lands (GC + ContextCleaner would get there eventually, but in a
  * long-lived session the dead MEMORY_AND_DISK blocks compete with the
  * queries that run after us in the meantime). On convergence only the
  * final labels checkpoint survives; the symmetric edge view is released
  * too.
  *
  * 100 TB notes: state is exactly (id, comp) per node — 16 bytes a row,
  * partitioned by id; the per-round shuffle is the edge list keyed by
  * endpoint. Duplicate/symmetric-duplicate edges are NOT pre-distinct'd:
  * the min aggregation dedups inherently and a `.distinct()` would be a
  * pure extra shuffle (the round-4 semi/anti lesson). Mega-cluster skew
  * (one boilerplate doc duplicated 10^8 times) concentrates edges on the
  * hub's id — min is algebraic, so AQE + partial aggregation absorb it.
  */
object Components {

  /** Component label per node: `component` = the smallest node id
    * reachable from `id` (deterministic representative election — same
    * min-wins rule as [[Dedup.exact]]'s keep_id). Ids need only be
    * ordered and joinable — numeric doc ids elect the numeric min,
    * string ids the lexicographic min (spec-pinned); mixing id types
    * between nodes and edges is a normal analysis-time type error.
    * Nodes absent from the edge list keep themselves as singleton
    * components. Throws
    * IllegalStateException if `maxIter` rounds don't reach the fixpoint
    * (a silent partial closure would merge too few clusters and leak
    * duplicates downstream). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          idCol: String = "id",
                          srcCol: String = "src", dstCol: String = "dst",
                          maxIter: Int = 30): DataFrame = {
    // symmetric view; self-loops dropped (they cannot change a min)
    val sym = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .union(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
      .where(col("__a") =!= col("__b"))
      .localCheckpoint(false) // materialized once on first round, reused every round
    // labelsCk tracks the round's checkpoint frame so the PREVIOUS round's
    // blocks can be released as soon as the new round has materialized
    var labelsCk = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
      .localCheckpoint(false)
    var labels: DataFrame = labelsCk
    var iter = 0
    var done = false
    // a failed run (non-convergence, a dead executor mid-count) must not
    // leave edge + label blocks pinned in the long-lived session — the
    // exact lag the explicit releases exist to avoid
    try {
      while (!done && iter < maxIter) {
      // min over neighbours' current labels (one keyed shuffle, map-side min)
      val neighbourMin = sym.join(labels, col("__b") === col("id"))
        .groupBy(col("__a")).agg(min("comp").as("__ncomp"))
      // the pre-round label rides along as __old so convergence is a
      // per-row comparison on the round's own output, not a second
      // join-the-previous-round job
      val prop = labels.as("l")
        .join(neighbourMin.as("n"), col("l.id") === col("n.__a"), "left")
        .select(col("l.id").as("id"),
          least(col("l.comp"), coalesce(col("__ncomp"), col("l.comp"))).as("comp"),
          col("l.comp").as("__old"))
      // pointer jump: comp ← comp(comp) — label values are node ids, so
      // the lookup is a self-join; left join keeps already-minimal labels
      val jumped = prop.as("x")
        .join(prop.select(col("id").as("__jid"), col("comp").as("__jcomp")).as("y"),
          col("x.comp") === col("y.__jid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.comp"), coalesce(col("__jcomp"), col("x.comp"))).as("comp"),
          col("x.__old").as("__old"))
      // ONE action per round: the lazy checkpoint materializes under the
      // changed-label count (an eager checkpoint + join + isEmpty probe
      // was two jobs and an extra shuffle per round)
      val next = jumped.localCheckpoint(false)
      done = next.where(col("comp") =!= col("__old")).count() == 0L
      // the count materialized `next`; the previous round's blocks are
      // now unreachable — free them before the next round allocates
      org.apache.spark.sql.graftbridge.ColumnBridge.releaseCheckpoint(labelsCk)
        labelsCk = next
        labels = next.select("id", "comp")
        iter += 1
      }
      if (!done)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — " +
            "raise maxIter; a partial closure would leak duplicates")
    } catch {
      case t: Throwable =>
        org.apache.spark.sql.graftbridge.ColumnBridge.releaseCheckpoint(sym)
        org.apache.spark.sql.graftbridge.ColumnBridge.releaseCheckpoint(labelsCk)
        throw t
    }
    // converged: downstream consumers read only the final labels
    // checkpoint — the edge view's blocks are dead, release them
    org.apache.spark.sql.graftbridge.ColumnBridge.releaseCheckpoint(sym)
    labels.select(col("id").as(idCol), col("comp").as("component"))
  }

  /** Duplicate clustering for a near-dup pair list: every document gets a
    * `component` (smallest doc id of its transitive duplicate cluster)
    * and a `is_rep` flag — keep `is_rep`, drop the rest. `pairs` is the
    * (a, b) output of any [[Dedup]] candidate generator + verifier. */
  def dupClusters(docs: DataFrame, pairs: DataFrame,
                  idCol: String = "doc_id",
                  aCol: String = "a", bCol: String = "b",
                  maxIter: Int = 30): DataFrame =
    connectedComponents(docs.select(idCol), pairs, idCol, aCol, bCol, maxIter)
      .withColumn("is_rep", col(idCol) === col("component"))
}
