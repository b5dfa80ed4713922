package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, SubqueryAlias}
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Mechanical enforcement of the oracle-gate output conventions that
  * until r13 lived only in CLAUDE.md discipline (each burned a past
  * round when violated by hand):
  *
  *  1. **No non-hashable output columns** — the driver's pandas
  *     comparator cannot hash array/map/struct/binary cells, and
  *     DECIMAL(38,0) arrives as object-dtype `decimal.Decimal` (the r9
  *     llm_manifest incident) — every such column must be serialized
  *     to a canonical string on BOTH sides before it leaves a declared
  *     query.
  *  2. **A deterministic global ORDER BY** — the comparator hashes row
  *     sequences, so an unordered result is replay-dependent even when
  *     the row SET matches (SURVEY §2.9-bis). Single-row outputs are
  *     exempt (ordering a single row is vacuous); the exemption is
  *     asserted, not assumed: the query must actually produce ≤1 row
  *     at sf0.001.
  *
  * Both checks walk the DECLARED oracle-gated queries only — the
  * rows-only demo faces are never hashed, so production-shaped output
  * (arrays of floats, binary signatures) stays legal there.
  */
class OracleContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir missing")

  private def nonHashable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => true
    // EVERY decimal, not just (38,0): the comparator materializes any
    // parquet decimal128 column as object-dtype decimal.Decimal while
    // the DuckDB oracle side arrives float64 — the hash diverges even
    // when values are identical (r9 llm_manifest at (38,0), r14
    // op_melt at (18,2)). Serialize to string on both sides instead.
    case _: DecimalType => true
    case _              => false
  }

  test("oracle-gated outputs carry only comparator-hashable column types") {
    val bad = graft.SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = graft.SparkEntry.queries(name)(spark, sfDir).schema
      schema.fields.filter(f => nonHashable(f.dataType))
        .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    withClue(bad.mkString("\n")) { bad shouldBe empty }
  }

  /** Queries whose result is a single row by construction — a global
    * ORDER BY would sort one row. Membership is verified row-count-wise
    * below, so an entry that starts returning multiple rows fails. */
  private val singleRow = Set("agg_global", "src_scan_parquet", "agg_hll_merge")

  @scala.annotation.tailrec
  private def stripTop(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, child)       => stripTop(child)
    case SubqueryAlias(_, child) => stripTop(child)
    // orderBy(...).limit(k) — the sorted-top-k shape plans limits above
    // the sort (physically TakeOrderedAndProject); still deterministic
    case org.apache.spark.sql.catalyst.plans.logical.GlobalLimit(_, child) => stripTop(child)
    case org.apache.spark.sql.catalyst.plans.logical.LocalLimit(_, child)  => stripTop(child)
    case other => other
  }

  test("every oracle-gated query ends in a global ORDER BY (or is provably single-row)") {
    val bad = graft.SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      stripTop(df.queryExecution.analyzed) match {
        case s: Sort if s.global => Nil
        case _ if singleRow(name) =>
          if (df.count() <= 1L) Nil
          else List(s"$name: in singleRow exemption but returned >1 row")
        case other => List(s"$name: top operator is ${other.nodeName}, not a global Sort")
      }
    }
    withClue(bad.mkString("\n")) { bad shouldBe empty }
  }
}
