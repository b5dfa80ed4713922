package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mergeable quantile sketch's contract, swept: GK guarantees the
  * returned value's EXACT rank lies within ±eps·N of q·N — on the
  * 1..N fixture a value IS its own rank, so the bound is assertable
  * directly, across quantiles, partitionings, and merge topologies. */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val N = 100000L
  private val eps = 0.01
  private val sweep = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def assertBound(qs: org.apache.spark.sql.catalyst.util.QuantileSummaries,
                          n: Long): Unit =
    for (q <- sweep) {
      val v = QuantileSketch.query(qs, q)
        .getOrElse(fail(s"empty sketch at q=$q"))
      withClue(s"q=$q returned $v (n=$n): ") {
        math.abs(v - q * n) should be <= (eps * n + 1)
      }
    }

  test("rank bound holds across the quantile sweep, any partitioning") {
    val df = spark.range(1, N + 1)
      .repartition(17)
      .select(col("id").cast("double").as("x"))
    val bytes = df.agg(QuantileSketch.agg(col("x"), eps).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val qs = QuantileSketch.fromBytes(bytes)
    qs.count shouldBe N
    assertBound(qs, N)
  }

  test("driver-merged per-group partials satisfy the same bound over the union") {
    val parts = spark.range(1, N + 1)
      .select(pmod(col("id"), lit(8)).as("g"), col("id").cast("double").as("x"))
      .groupBy("g")
      .agg(QuantileSketch.agg(col("x"), eps).as("sk"))
      .collect()
    parts.length shouldBe 8
    val merged = parts
      .map(r => QuantileSketch.fromBytes(r.getAs[Array[Byte]]("sk")))
      .reduce(QuantileSketch.merge)
    merged.count shouldBe N
    assertBound(merged, N)
    // merge order moves values, never the bound
    val reversed = parts.reverse
      .map(r => QuantileSketch.fromBytes(r.getAs[Array[Byte]]("sk")))
      .reduce(QuantileSketch.merge)
    assertBound(reversed, N)
  }

  test("nulls are skipped; an empty sketch queries to None and merges as identity") {
    val withNulls = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val qs = QuantileSketch.fromBytes(
      withNulls.agg(QuantileSketch.agg(col("x")).as("sk"))
        .head().getAs[Array[Byte]]("sk"))
    qs.count shouldBe 2L
    val empty = QuantileSketch.fromBytes(
      Seq.empty[Double].toDF("x")
        .agg(QuantileSketch.agg(col("x")).as("sk"))
        .head().getAs[Array[Byte]]("sk"))
    empty.count shouldBe 0L
    QuantileSketch.query(empty, 0.5) shouldBe None
    QuantileSketch.merge(qs, empty).count shouldBe 2L
    QuantileSketch.merge(empty, qs).count shouldBe 2L
    an[IllegalArgumentException] should be thrownBy
      QuantileSketchAgg(ColumnExpr.expr(col("x")), relativeError = 0.0)
  }

  // ---- storage format (the r15 verdict's one weak): pinned forever ----

  /** Hand-computed v1 blob: format byte 1, relativeError 0.01 (LE),
    * compressThreshold 10000, count 3, n 3, triples (1.0,1,0) (2.0,1,0)
    * (3.0,1,0). 97 bytes. If this test ever fails, the FORMAT drifted —
    * fix the code, never this literal: stored-at-ingest partials in the
    * wild are encoded exactly like this. */
  private val goldenHex =
    "017b14ae47e17a843f10270000030000000000000003000000" +
    "000000000000f03f01000000000000000000000000000000" +
    "000000000000004001000000000000000000000000000000" +
    "000000000000084001000000000000000000000000000000"

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("golden bytes: the v1 layout decodes to the pinned summary and re-encodes bit-identically") {
    val bytes = unhex(goldenHex)
    bytes.length shouldBe 97
    val qs = QuantileSketch.fromBytes(bytes)
    qs.relativeError shouldBe 0.01
    qs.compressThreshold shouldBe 10000
    qs.count shouldBe 3L
    qs.sampled.map(s => (s.value, s.g, s.delta)).toSeq shouldBe
      Seq((1.0, 1L, 0L), (2.0, 1L, 0L), (3.0, 1L, 0L))
    // exact on 3 points: median is 2.0
    QuantileSketch.query(qs, 0.5) shouldBe Some(2.0)
    // round-trip is bit-identical — the encoder can never silently drift
    QuantileSketch.toBytes(qs).toSeq shouldBe bytes.toSeq
  }

  test("the aggregate emits v1 bytes (format byte 1), never Java serialization") {
    val bytes = spark.range(1, 101)
      .select(col("id").cast("double").as("x"))
      .agg(QuantileSketch.agg(col("x"), eps).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    bytes(0) shouldBe QuantileSketch.FormatV1
    QuantileSketch.fromBytes(bytes).count shouldBe 100L
  }

  test("legacy pre-r16 Java-serialized partials still deserialize (migration path)") {
    import java.io.{ByteArrayOutputStream, ObjectOutputStream}
    var qs = new org.apache.spark.sql.catalyst.util.QuantileSummaries(
      org.apache.spark.sql.catalyst.util.QuantileSummaries.defaultCompressThreshold, eps)
    (1 to 50).foreach(i => qs = qs.insert(i.toDouble))
    qs = qs.compress()
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    try oos.writeObject(qs) finally oos.close()
    val legacy = bos.toByteArray
    (legacy(0) & 0xFF) shouldBe 0xAC // java stream magic, distinct from v1
    val back = QuantileSketch.fromBytes(legacy)
    back.count shouldBe 50L
    QuantileSketch.query(back, 0.5) shouldBe QuantileSketch.query(qs, 0.5)
    // and a legacy partial merges cleanly with a v1 partial
    val v1 = QuantileSketch.fromBytes(QuantileSketch.toBytes(qs))
    QuantileSketch.merge(back, v1).count shouldBe 100L
  }

  test("legacy path rejects classes outside the whitelist (gadget surface closed)") {
    // stored-at-ingest partials may come from an external store; an
    // unrestricted ObjectInputStream on a 0xACED blob is a Java
    // deserialization gadget surface. Any class outside the summary's
    // own object graph must throw BEFORE instantiation.
    import java.io.{ByteArrayOutputStream, ObjectOutputStream}
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    try oos.writeObject(new java.util.HashMap[String, String]()) finally oos.close()
    val hostile = bos.toByteArray
    (hostile(0) & 0xFF) shouldBe 0xAC
    val e = intercept[java.io.InvalidClassException] {
      QuantileSketch.fromBytes(hostile)
    }
    e.getMessage should include ("not allowed")
  }

  test("unknown format bytes are rejected loudly") {
    an[IllegalArgumentException] should be thrownBy
      QuantileSketch.fromBytes(Array[Byte](9, 9, 9, 9))
    an[IllegalArgumentException] should be thrownBy
      QuantileSketch.fromBytes(Array[Byte](1)) // too short
  }

  test("discreteRankPass == percentile_disc + rank sums on boundary-heavy fixtures (r21)") {
    // the single-buffer rank pass that replaced agg_quantile_merge's
    // three percentile_disc buffers must be BIT-IDENTICAL to the
    // aggregate it replaced — on exact boundaries especially (n
    // divisible by 4/2/10, where cume_dist == q exactly and a
    // rule-mismatch would pick the next value), and under heavy ties
    val qsBp = Seq(2500L, 5000L, 9000L)
    val fixtures: Seq[(String, Seq[Double])] = Seq(
      "1..20 (every boundary integral)" -> (1 to 20).map(_.toDouble),
      "1..40" -> (1 to 40).map(_.toDouble),
      "1..1000" -> (1 to 1000).map(_.toDouble),
      "n=17 (no integral boundary)" -> (1 to 17).map(_.toDouble),
      "heavy ties" -> (Seq.fill(25)(1.0) ++ Seq.fill(25)(2.0) ++
        Seq.fill(49)(3.0) ++ Seq(4.0)),
      "single value" -> Seq(7.5),
      "hashed spread" -> (1 to 333).map(i => ((i * 2654435761L) % 997).toDouble))
    for ((label, xs) <- fixtures) withClue(s"$label: ") {
      val df = xs.toDF("x").repartition(5)
      val n = xs.length.toLong
      val ests = Seq(xs.sorted.apply(((n / 4).toInt).max(1) - 1),
        xs.sorted.apply((n / 2).toInt.max(1) - 1), xs.max) // arbitrary probes
      val rks = qsBp.map(q => (q * n + 9999L) / 10000L)
      val got = graft.agg.Aggs.discreteRankPass(df, "x", ests, rks)
      val refAggs = Seq(count(lit(1)).cast("long").as("n")) ++
        qsBp.indices.flatMap { i =>
          Seq(sum(when(col("x") < ests(i), 1L).otherwise(0L))
              .cast("long").as(s"lo$i"),
            sum(when(col("x") <= ests(i), 1L).otherwise(0L))
              .cast("long").as(s"hi$i"))
        } ++
        qsBp.zipWithIndex.map { case (q, i) =>
          expr(s"percentile_disc(0.${"%04d".format(q)}) WITHIN GROUP " +
            "(ORDER BY x)").cast("double").as(s"d$i")
        }
      val ref = df.agg(refAggs.head, refAggs.tail: _*).head()
      got.getAs[Long]("n") shouldBe ref.getAs[Long]("n")
      for (i <- qsBp.indices) {
        got.getAs[Long](s"lo$i") shouldBe ref.getAs[Long](s"lo$i")
        got.getAs[Long](s"hi$i") shouldBe ref.getAs[Long](s"hi$i")
        withClue(s"d$i (q=${qsBp(i)}bp): ") {
          got.getAs[Double](s"d$i") shouldBe ref.getAs[Double](s"d$i")
        }
      }
    }
  }
}

/** Tiny local alias so the spec can build the case class directly. */
private object ColumnExpr {
  def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
}
