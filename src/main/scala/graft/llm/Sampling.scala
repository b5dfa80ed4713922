package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling (training-data pipeline mandate; no
  * analog in the reference). Both ops are reproducible across runs,
  * retries and cluster sizes — `df.sample`'s partition-seeded RNG is not
  * (repartitioning reshuffles which rows the seed hits), which at 100 TB
  * means a retried stage can silently change the corpus.
  */
object Sampling {

  /** Seeded hash-Bernoulli sample: keep a row iff
    * `xxhash64(keys, seed) mod 1e6 < fraction·1e6`. A pure narrow filter —
    * pushes into the scan when `keys` are scan columns, no shuffle, and
    * membership depends only on the key values. The same (keys, seed)
    * always selects the same rows, so derived datasets (e.g. a held-out
    * split with the complementary predicate) stay consistent. */
  def bernoulli(df: DataFrame, fraction: Double, keys: Seq[Column],
                seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    df.where(pmod(xxhash64((keys :+ lit(seed)): _*), lit(1000000L))
      < (fraction * 1000000L).toLong)
  }

  /** Stratified cap: at most `n` rows per `keys` group, chosen as the
    * first `n` under `order` — the "≤ N documents per (source, lang)"
    * balancing step of corpus curation. Delegates to the bounded-heap
    * per-group top-k (k rows per key per map task shuffle), NOT a window
    * row_number, which would sort every group in full. Pass a hash column
    * as `order` for an unbiased cap; a real column for a ranked cap.
    * Output columns are `keys ++ order` (the heap carries the order
    * struct); append payload columns to `order`'s tail — they ride along
    * without affecting selection when the prefix is already unique. */
  def capPerGroup(df: DataFrame, keys: Seq[Column], n: Int,
                  order: Seq[Column]): DataFrame =
    graft.relational.TopK.topKPerGroup(df, keys, order, n)

  /** Source-weighted mixture sampling — the "40 % web, 30 % code, …"
    * recipe step of training-data assembly: each stratum keeps a
    * deterministic fraction of its rows. `rates` maps a stratum value to
    * its keep-fraction; strata not listed are dropped (an unlisted
    * source must never leak into a weighed mixture). The keep decision
    * is a pure narrow filter on `(id · 2654435761) mod 10⁴ < rate·10⁴`
    * (Knuth's multiplicative constant; odd and coprime to 10⁴, so
    * consecutive ids sweep all residues uniformly), computed in REDUCED
    * residues: 2654435761 ≡ 5761 (mod 10⁴), so `(id mod 10⁴) · 5761
    * mod 10⁴` selects bit-identically — and its largest intermediate is
    * 9999 · 5761 < 2²⁶, where the naive product wraps Long past ids
    * ~3.47·10⁹ (an ANSI-mode crash at exactly the id spaces a corpus
    * recipe runs over). Codegen'd, pushable into the scan, retry-stable,
    * and expressible in ANSI SQL so the whole mixture is oracle-gated
    * end-to-end. For adversarial/clustered id spaces use [[bernoulli]]'s
    * xxhash64 per stratum instead; the rate plumbing here is the
    * operator, the lattice hash is the cross-engine-exact selector. */
  def mixture(df: DataFrame, rates: Map[String, Double],
              idCol: String = "doc_id",
              stratumCol: String = "source"): DataFrame = {
    require(rates.nonEmpty, "mixture needs at least one stratum rate")
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be fractions in [0, 1]")
    val bp = rates.map { case (s, r) => s -> math.round(r * 10000).toInt }
    val rateCol = bp.foldLeft(lit(-1)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, lit(b)).otherwise(acc)
    }
    df.where(
      pmod(pmod(col(idCol).cast("long"), lit(10000L)) * 5761L, lit(10000L)) < rateCol)
  }
}
