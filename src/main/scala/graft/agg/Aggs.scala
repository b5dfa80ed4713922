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
