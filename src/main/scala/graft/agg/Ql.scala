package graft.agg

import org.apache.spark.sql.{Column, DataFrame}

/** Declarative QL layer mirroring trembita-ql's
  * `query(_.filter(...).groupBy(keys).aggregate(decls).having(...).orderBy(...))`
  * builder (SURVEY §2.4 / §3 EP3; CITE: ql/src/main/scala/trembita/ql/
  * QueryBuilder.scala, recalled path — /root/reference empty).
  *
  * The reference tracks keys/decls at the type level with tagged HLists and
  * compiles them to one composite accumulator. Here the "compilation" is
  * Catalyst's: keys and decls become a single `groupBy(...).agg(...)` node,
  * so partial aggregation, codegen and AQE apply for free, and `having` /
  * `orderBy` stay in the same optimized plan instead of re-running passes.
  *
  * Usage:
  * {{{
  * Ql(lineitem)
  *   .where($"l_quantity" > 10)
  *   .groupBy($"l_returnflag".as("flag"))
  *   .aggregate(sum($"l_quantity").as("qty"), count(lit(1)).as("n"))
  *   .having($"n" > 40)
  *   .orderBy($"flag")
  *   .result
  * }}}
  */
final case class Ql(
    df: DataFrame,
    preFilter: Option[Column] = None,
    keys: Seq[Column] = Nil,
    decls: Seq[Column] = Nil,
    post: Option[Column] = None,
    order: Seq[Column] = Nil) {

  def where(c: Column): Ql = copy(preFilter = Some(preFilter.fold(c)(_ && c)))
  def groupBy(ks: Column*): Ql = copy(keys = ks)
  def aggregate(ds: Column*): Ql = copy(decls = ds)
  def having(c: Column): Ql = copy(post = Some(post.fold(c)(_ && c)))
  def orderBy(os: Column*): Ql = copy(order = os)

  def result: DataFrame = {
    require(decls.nonEmpty, "Ql.aggregate(...) is required")
    val filtered = preFilter.fold(df)(df.filter)
    val grouped =
      if (keys.isEmpty) filtered.agg(decls.head, decls.tail: _*)
      else filtered.groupBy(keys: _*).agg(decls.head, decls.tail: _*)
    val had = post.fold(grouped)(grouped.filter)
    if (order.isEmpty) had else had.orderBy(order: _*)
  }

  /** Typed result — trembita-ql's final `QueryResult` → case-class step
    * (SURVEY §3 EP3 step 4): grouped rows land in `T` by column name, with
    * Catalyst's upcast checks. Same plan as [[result]]; only the encoder
    * differs. */
  def resultAs[T: org.apache.spark.sql.Encoder]: org.apache.spark.sql.Dataset[T] =
    result.as[T]
}

object Ql {
  def apply(df: DataFrame): Ql = new Ql(df)
}
