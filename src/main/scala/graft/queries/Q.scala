package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when the semantics are
  * SQL-expressible) the DuckDB oracle the driver replays at sf0.01
  * (SURVEY §0 "operational consequence", §5.2). Queries without an oracle
  * get the driver's weaker rows-only check.
  *
  * Determinism contract (SURVEY §2.9-bis): every query ends in ORDER BY on
  * a unique key combination; floating aggregates are rounded or computed
  * in decimal; collected arrays are sorted; "first" is always min_by.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
