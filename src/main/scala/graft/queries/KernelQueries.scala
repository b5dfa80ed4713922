package graft.queries

import graft.core.{Attempt, Pipeline, Positional}
import graft.model.Tables
import org.apache.spark.sql.functions._

/** Kernel-op parity queries (SURVEY §2.1 sources, §2.2 per-element ops,
  * §2.5 dedup/sort/limit/set ops). Reference semantics: trembita's
  * DataPipelineT fluent ops (CITE: kernel/src/main/scala/trembita/
  * DataPipelineT.scala + the operations package, recalled paths —
  * /root/reference empty). Implementations are declarative Column ops
  * wherever possible so Catalyst pushes filters/projections into the
  * parquet scan; the typed Pipeline facade appears exactly where the
  * reference op is intrinsically lambda-shaped (collect-pf, mapM,
  * handleError, distinctBy).
  */
object KernelQueries {

  val all: Seq[Q] = Seq(

    // ----- §2.1 sources ------------------------------------------------
    Q("src_inline",
      "SELECT * FROM (VALUES (CAST(1 AS BIGINT),'alpha'),(CAST(2 AS BIGINT),'beta'),(CAST(3 AS BIGINT),'gamma')) AS t(id, name) ORDER BY id") {
      (spark, _) =>
        Pipeline.fromSeq(spark, Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))(
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.STRING))
          .toDF.toDF("id", "name").orderBy("id")
    },

    Q("src_range",
      "SELECT range AS id FROM range(0, 100) ORDER BY id") {
      (spark, _) => Pipeline.range(spark, 100).toDF.toDF("id").orderBy("id")
    },

    Q("src_scan_parquet",
      "SELECT count(*) AS n_rows FROM lineitem") {
      (spark, sf) => Tables.lineitem(spark, sf).agg(count(lit(1)).as("n_rows"))
    },

    // The DataSource V2 connector gate (S5's engine analog): write the
    // shuffleShards layout as sharded JSONL, read it back through the
    // graft-jsonl V2 table with a shard-pruning filter, and manifest
    // the survivors — doc counts, id range, poly-hash text checksum per
    // shard. The oracle replays the LAYOUT from documents directly, so
    // the whole connector path (JSON serialization round trip incl.
    // escaping, directory pruning, partition-column restoration, line
    // parsing) must be lossless to hash-match.
    Q("src_shard_jsonl",
      """WITH h AS (
        |  SELECT doc_id, source, text,
        |    ((doc_id % 999999937) * 654435887) % 999999937 AS hh
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, text,
        |    row_number() OVER (ORDER BY hh, doc_id) - 1 AS pos
        |  FROM h),
        |s AS (
        |  SELECT doc_id, text, CAST(pos // 64 AS BIGINT) AS shard_id
        |  FROM p),
        |ch AS (
        |  SELECT shard_id, doc_id,
        |    CASE WHEN len(text) = 0 THEN 0
        |      ELSE list_reduce(list_transform(string_split(text, ''),
        |             c -> CAST(unicode(c) AS BIGINT)),
        |           (a, b) -> (a * 31 + b) % 2147483647) END AS chash
        |  FROM s WHERE shard_id < 4)
        |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc,
        |  CAST(max(doc_id) AS BIGINT) AS max_doc,
        |  CAST(CAST(sum(chash) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
        |FROM ch GROUP BY shard_id ORDER BY shard_id""".stripMargin) {
      (spark, sf) =>
        val dir = "/tmp/graft_jsonl_gate_" + sf.replaceAll("[^a-zA-Z0-9]", "_")
        graft.sources.Sinks.jsonlShards(
          graft.llm.Packing.shuffleShards(
            Tables.documents(spark, sf).select("doc_id", "source", "text"),
            rowsPerShard = 64L),
          dir)
        spark.read.format("graft-jsonl")
          .schema("doc_id LONG, source STRING, text STRING, pos_in_shard LONG, shard_id LONG")
          .load(dir)
          .where(col("shard_id") < 4L)
          .groupBy("shard_id")
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"),
            sum(graft.functions.CharPolyHash(col("text"))
                .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("string").as("checksum"))
          .orderBy("shard_id")
    },

    // ----- §2.2 per-element ops ----------------------------------------
    // Money math in decimal on BOTH sides: double `round` disagrees between
    // engines on representation boundaries (1222.745 → .74 vs .75); decimal
    // products are exact and round identically (SURVEY §2.9-bis rule 2).
    Q("op_map",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice").cast("decimal(18,2)")
              * (lit(1) - col("l_discount").cast("decimal(18,2)")), 2)
              .cast("double").as("net"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    Q("op_filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .where(col("l_quantity") > 45)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber")
    },

    Q("op_collect_pf",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin) {
      (spark, sf) =>
        import spark.implicits._
        Pipeline(Tables.ordersDs(spark, sf))
          .collectPf { case o if o.o_orderstatus == "F" => (o.o_orderkey, o.o_totalprice) }
          .toDF.toDF("o_orderkey", "o_totalprice").orderBy("o_orderkey")
    },

    Q("op_flatmap",
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin) {
      (spark, sf) =>
        Tables.documents(spark, sf)
          .select(explode(split(col("text"), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy("token")
    },

    // mapM: effectful per-element map; pure-effect stand-in (SURVEY §2.2 P5).
    Q("op_mapm",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net
        |FROM lineitem WHERE l_quantity > 49
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (spark, sf) =>
        import spark.implicits._
        import scala.concurrent.Future
        Pipeline(Tables.lineitemDs(spark, sf))
          .filter(_.l_quantity > 49)
          .mapAsync(parallelism = 8) { l =>
            // decimal end-to-end: BigDecimal(double) takes the shortest
            // decimal representation, so 2dp inputs are exact.
            Future.successful(
              (l.l_orderkey, l.l_linenumber,
                (BigDecimal(l.l_extendedprice).setScale(2, BigDecimal.RoundingMode.HALF_UP)
                  * (BigDecimal(1) - BigDecimal(l.l_discount).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
                  .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
          }
          .toDF.toDF("l_orderkey", "l_linenumber", "net")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // handleError: failures become rows, not job aborts (SURVEY §2.2 P6).
    // The row records the exception CLASS, not getMessage — HotSpot's
    // fast-throw optimization nulls messages of hot implicit exceptions, so
    // messages are nondeterministic at scale. Poison density ~0.1% (the
    // realistic shape: a few bad rows in a huge scan, not a hot error path).
    Q("op_handle_error",
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN NOT (l_linenumber = 7 AND l_orderkey % 100 = 0)
        |       THEN CAST(100 // (l_linenumber + 1) AS BIGINT) END AS ok,
        |  CASE WHEN l_linenumber = 7 AND l_orderkey % 100 = 0
        |       THEN 'java.lang.ArithmeticException' END AS err
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (spark, sf) =>
        import spark.implicits._
        // project BEFORE entering the typed map: Catalyst cannot prune
        // columns through an opaque closure, so the narrow select is what
        // keeps the parquet scan at 2 columns instead of 11
        Pipeline(Tables.lineitem(spark, sf)
            .select("l_orderkey", "l_linenumber").as[(Long, Int)])
          .map { case (ok, ln) =>
            val denom = if (ln == 7 && ok % 100 == 0) 0 else ln + 1
            val a = Attempt(ln)(_ => (100 / denom).toLong)
            (ok, ln, a.ok, a.errClass)
          }
          .toDF.toDF("l_orderkey", "l_linenumber", "ok", "err")
          .orderBy("l_orderkey", "l_linenumber")
    },

    Q("op_zip_with_index",
      """SELECT o_orderkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx
        |FROM orders ORDER BY o_orderkey""".stripMargin) {
      (spark, sf) =>
        Positional.zipWithIndex(
            Tables.orders(spark, sf).select("o_orderkey"), Seq(col("o_orderkey")))
          .withColumn("idx", col("idx").cast("long"))
          .orderBy("o_orderkey")
    },

    // ----- §2.3 J7 positional zip --------------------------------------
    Q("op_zip",
      """SELECT a.c_custkey AS c_custkey, b.c_name AS other_name FROM
        |  (SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rn FROM customer) a
        |  JOIN (SELECT c_name, row_number() OVER (ORDER BY c_name) AS rn FROM customer) b
        |  USING (rn)
        |ORDER BY c_custkey""".stripMargin) {
      (spark, sf) =>
        val c = Tables.customer(spark, sf)
        Positional.zip(
            c.select("c_custkey"), Seq(col("c_custkey")),
            c.select(col("c_name").as("other_name")), Seq(col("other_name")))
          .orderBy("c_custkey")
    },

    // ----- §2.5 dedup / sort / limit / set ops -------------------------
    Q("op_distinct",
      "SELECT DISTINCT c_mktsegment AS seg FROM customer ORDER BY 1") {
      (spark, sf) =>
        Tables.customer(spark, sf).select(col("c_mktsegment").as("seg"))
          .distinct().orderBy("seg")
    },

    // distinctBy: deterministic keeper = min by (totalprice, orderkey).
    Q("op_distinct_by",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin) {
      (spark, sf) =>
        import spark.implicits._
        implicit val ord: Ordering[graft.model.Order] =
          Ordering.by(o => (o.o_totalprice, o.o_orderkey))
        Pipeline(Tables.ordersDs(spark, sf))
          .distinctBy(_.o_custkey)
          .toDF.select("o_custkey", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey")
    },

    Q("op_sort",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin) {
      (spark, sf) =>
        Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },

    // top-k plans as TakeOrderedAndProject — no global sort at scale.
    Q("op_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) {
      (spark, sf) =>
        Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
    },

    Q("op_slice",
      """SELECT o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS rn FROM orders)
        |WHERE rn >= 100 AND rn < 200 ORDER BY o_orderkey""".stripMargin) {
      (spark, sf) =>
        Positional.slice(
            Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
            Seq(col("o_orderkey")), 100, 200)
          .orderBy("o_orderkey")
    },

    Q("op_drop",
      """SELECT o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_orderkey) - 1 AS rn FROM orders)
        |WHERE rn >= 1400 ORDER BY o_orderkey""".stripMargin) {
      (spark, sf) =>
        Positional.drop(
            Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
            Seq(col("o_orderkey")), 1400)
          .orderBy("o_orderkey")
    },

    Q("op_union_all",
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin) {
      (spark, sf) =>
        val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
        o.where(col("o_orderstatus") === "F")
          .union(o.where(col("o_orderstatus") === "O"))
          .orderBy("o_orderkey")
    },

    Q("op_intersect",
      """SELECT c_custkey FROM customer WHERE c_acctbal > 0
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) {
      (spark, sf) =>
        Tables.customer(spark, sf).where(col("c_acctbal") > 0).select("c_custkey")
          .intersect(Tables.orders(spark, sf).select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey")
    },

    // Subtrahend restricted to pre-1996 orders so the expected result is
    // non-empty at every scale factor (fixture orderdates span 1995..2001):
    // the unrestricted form compared empty-to-empty at sf0.01, making the
    // gate unable to detect inverted operands.
    Q("op_except",
      """SELECT c_custkey FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders
        |WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |ORDER BY c_custkey""".stripMargin) {
      (spark, sf) =>
        Tables.customer(spark, sf).where(col("c_acctbal") > 0).select("c_custkey")
          .except(Tables.orders(spark, sf)
            .where(col("o_orderdate") < to_timestamp(lit("1996-01-01")))
            .select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey")
    }
  )
}
