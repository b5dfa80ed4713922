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

  /** A6 `product` — multiplicative fold. Spark has no product aggregate. */
  val product: Aggregator[Double, Double, Double] =
    new Aggregator[Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: Double): Double = b * a
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

  /** Typed reduction used by Pipeline.distinctBy and QL `combineAll`. */
  def foldAggregator[A: Encoder](z: A)(f: (A, A) => A): Aggregator[A, A, A] =
    new Aggregator[A, A, A] {
      def zero: A = z
      def reduce(b: A, a: A): A = f(b, a)
      def merge(b1: A, b2: A): A = f(b1, b2)
      def finish(b: A): A = b
      def bufferEncoder: Encoder[A] = implicitly[Encoder[A]]
      def outputEncoder: Encoder[A] = implicitly[Encoder[A]]
    }
}
