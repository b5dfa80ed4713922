package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference's `AggFunc` algebra is add/combine/extract — partial then
  * final (SURVEY §2.4; CITE: ql/src/main/scala/trembita/ql/AggFunc.scala,
  * recalled path — /root/reference empty). That is exactly Spark's
  * `Aggregator[IN, BUF, OUT]`: `reduce`=add, `merge`=combine,
  * `finish`=extract. Partial aggregation (map-side combine) is what makes
  * these shuffle only one buffer per key per partition at 100 TB.
  *
  * Only aggregates Spark lacks get an Aggregator; everything else maps to
  * codegen'd built-ins (SURVEY §4.2).
  */
object Aggs {

  /** ONE-buffer exact replay of k discrete percentiles plus their rank
    * windows (r21, guide §5 memory): `k` separate `percentile_disc`
    * aggregates each buffer the ENTIRE value multiset in one final
    * aggregation task — k full copies of the column for three order
    * statistics. This pass instead groups the VALUE HISTOGRAM (a
    * parallel codegen hash agg), runs one cumulative-count window over
    * the sorted distinct values (a single sorted pass over the value
    * DOMAIN — the strictly smaller, spillable shape), and reads every
    * statistic off the cumulative frame in one tiny final agg.
    *
    * Returns one Row: `n` (total rows) and, per index i, `lo$i` (rows
    * strictly below `ests(i)`), `hi$i` (rows at or below `ests(i)`),
    * and `d$i` (the smallest value whose cumulative count reaches
    * `ranks(i)`, cast to double). With `ranks(i) = ceil(q·n)` —
    * integer-exact via `(qBp·n + 9999) / 10000` — `d$i` IS SQL-standard
    * `percentile_disc(q)`: the least v with cume_dist ≥ q. For the
    * declared basis-point percentages this rational rule coincides with
    * double evaluation (q·n within half an ulp of the true rational
    * whenever the boundary is integral), and QuantileSketchSpec pins the
    * equivalence against `percentile_disc` on boundary-heavy fixtures
    * (n divisible by 4/2/10, heavy ties). Non-null, non-empty input is
    * the caller's contract (the declared faces' columns are both).
    *
    * The window is partition-less by necessity — an exact global rank
    * is value-domain-sized, the same domain each percentile_disc buffer
    * held — and is WindowBudgets-registered by the calling query. */
  def discreteRankPass(values: org.apache.spark.sql.DataFrame,
                       valueCol: String, ests: Seq[Double],
                       ranks: Seq[Long]): org.apache.spark.sql.Row = {
    require(ests.length == ranks.length,
      s"ests (${ests.length}) and ranks (${ranks.length}) must align")
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = values.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
      .select(col("v"), sum(col("c")).over(w).as("cum"))
    val aggs = Seq(max(col("cum")).cast("long").as("n")) ++
      ests.indices.flatMap { i =>
        Seq(coalesce(max(when(col("v") < ests(i), col("cum"))), lit(0L))
            .cast("long").as(s"lo$i"),
          coalesce(max(when(col("v") <= ests(i), col("cum"))), lit(0L))
            .cast("long").as(s"hi$i"),
          min(when(col("cum") >= ranks(i), col("v")))
            .cast("double").as(s"d$i"))
      }
    cum.agg(aggs.head, aggs.tail: _*).head()
  }

  /** A6 `product` — multiplicative fold. Spark has no product aggregate.
    * The input is the BOXED double so SQL NULLs arrive as null and are
    * SKIPPED, like every built-in aggregate — the primitive-Double form
    * decoded a null as 0.0 and zeroed the whole group's product. */
  val product: Aggregator[java.lang.Double, Double, Double] =
    new Aggregator[java.lang.Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: java.lang.Double): Double =
        if (a == null) b else b * a.doubleValue()
      def merge(b1: Double, b2: Double): Double = b1 * b2
      def finish(b: Double): Double = b
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form of product, registered as a UDAF. */
  def productCol(c: Column): Column = udaf(product).apply(c)

  /** A10 `rms` — root-mean-square, as pure built-ins (codegen'd). */
  def rms(c: Column): Column = sqrt(avg(pow(c, lit(2))))

  /** A8 `stringAgg` — deterministic string concat: sort collected values
    * before joining (SURVEY §2.9-bis rule 3). */
  def stringAgg(c: Column, sep: String): Column =
    concat_ws(sep, array_sort(collect_list(c)))

  /** A7 `arr` — group-as-array, order-normalized. */
  def arrSorted(c: Column): Column = array_sort(collect_list(c))

  /** A11 `random`/arbitrary element — made deterministic: the value of
    * `value` at the minimum `order` within the group. min_by is a
    * single-pass built-in (no window, no second shuffle). */
  def firstBy(value: Column, order: Column): Column = min_by(value, order)

  /** Typed distributed fold. `z` is applied exactly ONCE, at finish: an
    * Aggregator's `zero` initializes EVERY partition's partial buffer, so
    * folding `z` in there applies it once per partition and makes the
    * result partitioning-dependent for any non-identity zero (36 vs 16
    * for z=10 over [1,2,3] in 3 partitions — caught in review; the
    * identity-zero spec masked it). The buffer is (seen, acc): partials
    * reduce/merge with `f` alone, and finish computes `f(z, a₁ f a₂ …)`
    * — the fold, under the associativity any distributed fold requires.
    * Empty input → z. */
  def foldAggregator[A: Encoder](z: A)(f: (A, A) => A): Aggregator[A, (Boolean, A), A] =
    new Aggregator[A, (Boolean, A), A] {
      def zero: (Boolean, A) = (false, z) // z here is a placeholder, never folded
      def reduce(b: (Boolean, A), a: A): (Boolean, A) =
        if (!b._1) (true, a) else (true, f(b._2, a))
      def merge(b1: (Boolean, A), b2: (Boolean, A)): (Boolean, A) =
        if (!b1._1) b2
        else if (!b2._1) b1
        else (true, f(b1._2, b2._2))
      def finish(b: (Boolean, A)): A = if (b._1) f(z, b._2) else z
      def bufferEncoder: Encoder[(Boolean, A)] =
        Encoders.tuple(Encoders.scalaBoolean, implicitly[Encoder[A]])
      def outputEncoder: Encoder[A] = implicitly[Encoder[A]]
    }
}
