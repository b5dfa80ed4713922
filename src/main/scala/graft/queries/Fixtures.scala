package graft.queries

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared planted fixtures used by several declared queries — ONE
  * definition per planted pipeline, so a cross-engine tweak (regex
  * escaping, threshold re-probe, bridge-host change) can never be
  * applied to one copy and miss a sibling (the r16 review's
  * duplication finding). Fragments are pre-stripped at definition and
  * CONCATENATED into full oracles — never re-interpolated into another
  * stripMargin template (the r13 `||` rule). */
private[queries] object GraphFixture {

  /** Oracle CTE prefix shared by the three outlink-graph queries:
    * planted docs → href extraction → weighted edges
    * `e(src, dst_host, n_links)` → bipartite `edges(a, b)` →
    * min-label closure `comp(id, component)`. Callers append their
    * final SELECT. Planted structure probed in DuckDB (r16): 104
    * nodes, 4 components of 26, stable tri-scale. */
  val closureCtes: String =
    """WITH RECURSIVE p AS (
      |  SELECT source, doc_id,
      |    text
      |    || ' <a href="http://s-' || source || '-'
      |      || ((doc_id % 80) // 20) || '.example.net/p">x</a>'
      |    || CASE WHEN doc_id % 7 = 0
      |      THEN ' <a href="HTTP://Bridge-'
      |        || (CAST(substr(source, 4) AS INT) % 4) || '.Example.org/q">b</a>'
      |      ELSE '' END AS text
      |  FROM documents),
      |u AS (
      |  SELECT source AS src,
      |    unnest(regexp_extract_all(text, 'href="([^"]+)"', 1)) AS url
      |  FROM p),
      |h AS (
      |  SELECT src,
      |    lower(regexp_extract(url,
      |      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS dst_host
      |  FROM u),
      |e AS (
      |  SELECT src, dst_host, CAST(count(*) AS BIGINT) AS n_links FROM h
      |  WHERE dst_host IS NOT NULL AND dst_host <> ''
      |  GROUP BY 1, 2),
      |edges AS (SELECT 'src:' || src AS a, 'host:' || dst_host AS b FROM e),
      |sym AS (SELECT a AS s, b AS d FROM edges UNION SELECT b, a FROM edges),
      |parts AS (SELECT DISTINCT s AS id FROM sym),
      |reach(id, m) AS (
      |  SELECT id, id FROM parts
      |  UNION
      |  SELECT s.d, r.m FROM reach r JOIN sym s ON s.s = r.id),
      |comp AS (SELECT id, min(m) AS component FROM reach GROUP BY id)""".stripMargin

  /** The engine-side twin of `p`: documents with the SAME planted
    * anchors. */
  def plantedDocs(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf).select(col("source"),
      concat(col("text"),
        lit(" <a href=\"http://s-"), col("source"), lit("-"),
        expr("(doc_id % 80) DIV 20").cast("string"),
        lit(".example.net/p\">x</a>"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" <a href=\"HTTP://Bridge-"),
            pmod(substring(col("source"), 4, 10).cast("int"), lit(4))
              .cast("string"),
            lit(".Example.org/q\">b</a>"))).otherwise(lit("")))
        .as("text"))

  /** The engine-side twin of `e`: weighted (src, dst_host, n_links). */
  def weightedEdges(spark: SparkSession, sf: String): DataFrame =
    graft.llm.Audit.outlinks(plantedDocs(spark, sf))

  /** The engine-side twin of `edges`: prefixed bipartite pairs. */
  def bipartiteEdges(weighted: DataFrame): DataFrame =
    weighted.select(concat(lit("src:"), col("src")).as("a"),
      concat(lit("host:"), col("dst_host")).as("b"))
}

/** The op_upsert changelog fixture, shared with stream_cdc_upsert:
  * update / delete / insert planted in the scan projection, an
  * update-then-delete key so version order decides. */
private[queries] object CdcFixture {

  /** Oracle CTE prefix: base + changelog + latest-per-key (`l1`).
    * Callers append the merge SELECT. */
  val changelogCtes: String =
    """WITH o AS (
      |  SELECT o_orderkey k, o_orderpriority p, o_totalprice t FROM orders),
      |base AS (SELECT k, p, t FROM o WHERE k % 3 = 0),
      |chg AS (
      |  SELECT k, 'X-UPD' AS p, t + 1.0 AS t, 1 AS v, 'U' AS op
      |  FROM o WHERE k % 21 = 0
      |  UNION ALL
      |  SELECT k, '', 0.0, 2, 'D' FROM o WHERE k % 15 = 0
      |  UNION ALL
      |  SELECT k + 100000000, '9-NEW', t, 1, 'U' FROM o WHERE k % 33 = 0),
      |last AS (
      |  SELECT k, p, t, op,
      |    row_number() OVER (PARTITION BY k ORDER BY v DESC) rn
      |  FROM chg),
      |l1 AS (SELECT k, p, t, op FROM last WHERE rn = 1)""".stripMargin

  /** Latest-per-key restricted to version <= 1 — the AS OF cut the
    * time-travel face gates against (the v2 deletes must NOT apply).
    * Pre-stripped, CONCATENATED after [[changelogCtes]] (the r13 rule:
    * never re-interpolate a stripped fragment into another template). */
  val asOfV1Ctes: String =
    """,lastv AS (
      |  SELECT k, p, t, op,
      |    row_number() OVER (PARTITION BY k ORDER BY v DESC) rn
      |  FROM chg WHERE v <= 1),
      |l1v AS (SELECT k, p, t, op FROM lastv WHERE rn = 1)""".stripMargin

  /** The merge SELECT over a latest-per-key CTE (`l1` = whole log,
    * `l1v` = the AS OF version-1 cut). */
  def mergedSelectOn(latestCte: String): String =
    """SELECT coalesce(b.k, c.k) AS o_orderkey,
      |  CASE WHEN c.op = 'U' THEN c.p ELSE b.p END AS o_orderpriority,
      |  CASE WHEN c.op = 'U' THEN c.t ELSE b.t END AS o_totalprice
      |FROM base b FULL OUTER JOIN """.stripMargin + latestCte +
      " c ON b.k = c.k\n" +
    """WHERE c.op IS NULL OR c.op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** The whole-log merge result both r16 faces gate against. */
  val mergedSelect: String = mergedSelectOn("l1")

  /** The point-lookup key set (r18, `stream_cdc_read_keys`): four
    * non-vacuous classes — base passthrough (%6 ⊆ the %3 base),
    * updated (%42 ⊆ %21), deleted-so-absent (%30 ⊆ %15), inserted
    * (+1e8 for %66 ⊆ %33) — plus keys absent everywhere (+2e8 for
    * %77), which must yield no row. Pre-stripped, CONCATENATED after
    * [[changelogCtes]] (the r13 rule). */
  val wantedKeysCte: String =
    """,wanted AS (
      |  SELECT k FROM o WHERE k % 6 = 0
      |  UNION ALL SELECT k + 100000000 FROM o WHERE k % 66 = 0
      |  UNION ALL SELECT k + 200000000 FROM o WHERE k % 77 = 0)""".stripMargin

  /** The whole-log merge restricted to the wanted key set — what
    * point lookup must return. */
  val keyedSelect: String =
    """SELECT coalesce(b.k, c.k) AS o_orderkey,
      |  CASE WHEN c.op = 'U' THEN c.p ELSE b.p END AS o_orderpriority,
      |  CASE WHEN c.op = 'U' THEN c.t ELSE b.t END AS o_totalprice
      |FROM base b FULL OUTER JOIN l1 c ON b.k = c.k
      |WHERE (c.op IS NULL OR c.op <> 'D')
      |  AND coalesce(b.k, c.k) IN (SELECT k FROM wanted)
      |ORDER BY o_orderkey""".stripMargin

  /** Engine-side twin of `wanted` — all three classes emitted from ONE
    * scan projection (the r14 one-scan planting rule: a 3-leg union
    * reads the table once per leg per consumer). */
  def wantedKeys(spark: SparkSession, sf: String): DataFrame =
    Tables.orders(spark, sf).select(explode(array(
        when(pmod(col("o_orderkey"), lit(6)) === 0, col("o_orderkey")),
        when(pmod(col("o_orderkey"), lit(66)) === 0,
          col("o_orderkey") + 100000000L),
        when(pmod(col("o_orderkey"), lit(77)) === 0,
          col("o_orderkey") + 200000000L)))
        .as("o_orderkey"))
      .where(col("o_orderkey").isNotNull)

  /** The schema-evolution variant (r17): the same changelog with a NEW
    * payload column `nt` the base never had — the oracle for "bootstrap
    * pre-evolution, evolve, then every later batch carries the column"
    * (base-only keys read NULL; deletes ignore it). Self-contained
    * CTE-plus-SELECT, concatenation-free. */
  val notedOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey k, o_orderpriority p, o_totalprice t FROM orders),
      |base AS (SELECT k, p, t FROM o WHERE k % 3 = 0),
      |chg AS (
      |  SELECT k, 'X-UPD' AS p, t + 1.0 AS t, 'u' || (k % 97) AS nt,
      |    1 AS v, 'U' AS op
      |  FROM o WHERE k % 21 = 0
      |  UNION ALL
      |  SELECT k, '', 0.0, '', 2, 'D' FROM o WHERE k % 15 = 0
      |  UNION ALL
      |  SELECT k + 100000000, '9-NEW', t, 'w' || (k % 89), 1, 'U'
      |  FROM o WHERE k % 33 = 0),
      |last AS (
      |  SELECT k, p, t, nt, op,
      |    row_number() OVER (PARTITION BY k ORDER BY v DESC) rn
      |  FROM chg),
      |l1 AS (SELECT k, p, t, nt, op FROM last WHERE rn = 1)
      |SELECT coalesce(b.k, c.k) AS o_orderkey,
      |  CASE WHEN c.op = 'U' THEN c.p ELSE b.p END AS o_orderpriority,
      |  CASE WHEN c.op = 'U' THEN c.t ELSE b.t END AS o_totalprice,
      |  CASE WHEN c.op = 'U' THEN c.nt END AS o_note
      |FROM base b FULL OUTER JOIN l1 c ON b.k = c.k
      |WHERE c.op IS NULL OR c.op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** Engine-side twins of the noted variant's `base` and `chg`. */
  def baseAndNotedChanges(spark: SparkSession, sf: String)
      : (DataFrame, DataFrame) = {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val base = o.where(pmod(col("o_orderkey"), lit(3)) === 0)
    def row(k: Column, p: Column, t: Column, nt: Column, v: Long, op: String) =
      struct(k.as("o_orderkey"), p.as("o_orderpriority"),
        t.as("o_totalprice"), nt.as("o_note"),
        lit(v).as("version"), lit(op).as("op"))
    val changes = o.select(explode(array(
        when(pmod(col("o_orderkey"), lit(21)) === 0,
          row(col("o_orderkey"), lit("X-UPD"),
            col("o_totalprice") + 1.0d,
            concat(lit("u"), pmod(col("o_orderkey"), lit(97)).cast("string")),
            1L, "U")),
        when(pmod(col("o_orderkey"), lit(15)) === 0,
          row(col("o_orderkey"), lit(""), lit(0.0d), lit(""), 2L, "D")),
        when(pmod(col("o_orderkey"), lit(33)) === 0,
          row(col("o_orderkey") + 100000000L, lit("9-NEW"),
            col("o_totalprice"),
            concat(lit("w"), pmod(col("o_orderkey"), lit(89)).cast("string")),
            1L, "U"))))
        .as("c"))
      .where(col("c").isNotNull)
      .select(col("c.*"))
    (base, changes)
  }

  /** Engine-side twins of `base` and `chg`. */
  def baseAndChanges(spark: SparkSession, sf: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val base = o.where(pmod(col("o_orderkey"), lit(3)) === 0)
    def row(k: Column, p: Column, t: Column, v: Long, op: String) =
      struct(k.as("o_orderkey"), p.as("o_orderpriority"),
        t.as("o_totalprice"), lit(v).as("version"), lit(op).as("op"))
    val changes = o.select(explode(array(
        when(pmod(col("o_orderkey"), lit(21)) === 0,
          row(col("o_orderkey"), lit("X-UPD"),
            col("o_totalprice") + 1.0d, 1L, "U")),
        when(pmod(col("o_orderkey"), lit(15)) === 0,
          row(col("o_orderkey"), lit(""), lit(0.0d), 2L, "D")),
        when(pmod(col("o_orderkey"), lit(33)) === 0,
          row(col("o_orderkey") + 100000000L, lit("9-NEW"),
            col("o_totalprice"), 1L, "U"))))
        .as("c"))
      .where(col("c").isNotNull)
      .select(col("c.*"))
    (base, changes)
  }
}
