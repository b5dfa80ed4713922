package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the codegen kernel family: on ARBITRARY inputs,
  * each kernel must stay bit-identical to the Column formulation it
  * replaced (the fixed-fixture specs pin the tricky known cases; these
  * pin the unknown ones). Few cases per law — each case is a Spark job. */
class KernelLawsSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(6)
  private def check(p: Prop): Unit =
    assert(SCTest.check(params, p).passed, "property failed")

  // words over a tiny alphabet (forces shingle/marker collisions), with
  // occasional empty tokens via doubled separators
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "dd", "", "the"))
  } yield ws.mkString(" ")

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    ts <- Gen.listOfN(n, textGen)
  } yield ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("WordShingles ≡ split+transform+slice+concat_ws on arbitrary text") {
    check(Prop.forAll(docsGen, Gen.choose(1, 4)) { (rows, k) =>
      val df = rows.toDF("doc_id", "text")
      val toks = split(col("text"), " ")
      val n = org.apache.spark.sql.functions.size(toks)
      val kernel = df.select(col("doc_id"), WordShingles(col("text"), k).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      val naive = df.select(col("doc_id"),
          transform(sequence(lit(0), greatest(n - k, lit(0))),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))).as("s"))
        .as[(Long, Seq[String])].collect().toMap
      kernel == naive
    })
  }

  test("MinHashLanes ≡ min(xxhash64(shingle, i)) on arbitrary text") {
    check(Prop.forAll(docsGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val h = 5
      val kernel = df.select(col("doc_id"),
          MinHashLanes(WordShingles(col("text"), 2), h).as("mh"))
        .as[(Long, Seq[Long])].collect().toMap
      val sh = df.select(col("doc_id"),
        explode(WordShingles(col("text"), 2)).as("shingle"))
      val lanes = (0 until h).map(i =>
        min(xxhash64(col("shingle"), lit(i))).as(s"mh$i"))
      val naive = sh.groupBy("doc_id").agg(lanes.head, lanes.tail: _*)
        .collect().map(r => r.getLong(0) -> (1 to h).map(r.getLong)).toMap
      kernel == naive
    })
  }

  test("SimHash64 ≡ explode+vote-lane aggregate on arbitrary text") {
    check(Prop.forAll(docsGen) { rows =>
      // explode drops empty token arrays, SimHash64 doesn't — compare on
      // the common (non-empty) key set, which split("", " ") guarantees
      val df = rows.toDF("doc_id", "text")
      val kernel = df.select(col("doc_id"),
          SimHash64(split(col("text"), " ")).as("h"))
        .as[(Long, Long)].collect().toMap
      val toks = df.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("th", xxhash64(col("tok")))
      val votes = (0 until 64).map(j =>
        sum(when(shiftright(col("th"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j"))
      val naive = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_.bitwiseOR(_)).as("h"))
        .as[(Long, Long)].collect().toMap
      naive.forall { case (id, h) => kernel(id) == h }
    })
  }

  test("CountTokensIn ≡ size(filter(array_contains)) on arbitrary text") {
    val markers = Seq("a", "the", "cc")
    check(Prop.forAll(docsGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val kernel = df.select(col("doc_id"),
          CountTokensIn(split(col("text"), " "), markers).as("n"))
        .as[(Long, Long)].collect().toMap
      val naive = df.select(col("doc_id"),
          org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.filter(split(col("text"), " "),
              t => array_contains(array(markers.map(lit): _*), t)))
            .cast("long").as("n"))
        .as[(Long, Long)].collect().toMap
      kernel == naive
    })
  }

  test("MinGramHash ≡ array_min(transform(xxhash64(substr))) on arbitrary text") {
    check(Prop.forAll(docsGen, Gen.choose(1, 6)) { (rows, gram) =>
      val df = rows.toDF("doc_id", "text")
      val kernel = df.select(col("doc_id"), MinGramHash(col("text"), gram).as("f"))
        .as[(Long, Long)].collect().toMap
      val naive = df.select(col("doc_id"),
          array_min(transform(
            sequence(lit(1), greatest(
              org.apache.spark.sql.functions.length(col("text")) - (gram - 1), lit(1))),
            i => xxhash64(col("text").substr(i, lit(gram))))).as("f"))
        .as[(Long, Long)].collect().toMap
      kernel == naive
    })
  }

  // arbitrary unicode text: ascii mixed with combining/astral code points
  // (the cross-engine kernels iterate CODE POINTS — surrogate pairs are
  // the case a char-indexed bug would get wrong)
  private val uniGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    cs <- Gen.listOfN(n, Gen.oneOf("a", "b", " ", "é", "ü", "中", "😀", "𝕏"))
  } yield cs.mkString

  test("PolyMinGramHash ≡ code-point sliding-window reference on arbitrary unicode") {
    val M = 2147483647L
    def ref(text: String, gram: Int): Option[Long] = {
      val cps = text.codePoints().toArray.map(_.toLong)
      if (cps.isEmpty) None
      else Some(cps.sliding(gram, 1).take(math.max(cps.length - gram + 1, 1))
        .map(g => g.tail.foldLeft(g.head)((a, b) => (a * 31L + b) % M)).min)
    }
    check(Prop.forAll(Gen.listOfN(8, uniGen), Gen.choose(1, 6)) { (texts, gram) =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val kernel = rows.toDF("doc_id", "text")
        .select(col("doc_id"), PolyMinGramHash(col("text"), gram).as("f"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      rows.forall { case (id, t) => kernel(id) == ref(t, gram) }
    })
  }

  test("compressibilityProxy ≡ integer reference (token/gram chains, buckets, l2) on arbitrary text") {
    val M = 2147483647L
    val buckets = 1 << 20
    def ref(text: String): Option[Long] = {
      val toks = text.split(" ", -1).filter(_.nonEmpty)
      if (toks.isEmpty) return None
      val th = toks.map(t => t.codePoints().toArray.map(_.toLong)
        .reduceLeft((a, b) => (a * 31L + b) % M))
      val m = math.max(th.length - 3, 0) + 1
      val gh = (0 until m).map { p =>
        th.slice(p, math.min(p + 3, th.length))
          .reduceLeft((a, b) => (a * 1000003L + b) % M) % buckets
      }
      val x = gh.length.toLong * 1024L / gh.distinct.length
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
      Some(msb * 1024L + ((x << 10) >> msb) - 1024L - 10240L)
    }
    check(Prop.forAll(docsGen) { rows =>
      val out = graft.llm.TextStats.compressibilityProxy(
          rows.toDF("doc_id", "text"))
        .as[(Long, Long)].collect().toMap
      rows.forall { case (id, t) => out.get(id) == ref(t) }
    })
  }

  test("SignProjection ≡ per-plane when(dot≥0) on arbitrary vectors") {
    val vecGen: Gen[List[(Long, Array[Float])]] = for {
      n <- Gen.choose(1, 10)
      vs <- Gen.listOfN(n, Gen.listOfN(6, Gen.choose(-5.0f, 5.0f)))
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val rng = new scala.util.Random(21L)
    val planes = Array.fill(2 * 3)(Array.fill(6)(rng.nextGaussian()))
    check(Prop.forAll(vecGen) { rows =>
      val df = rows.toDF("id", "v")
      val kernel = df.select(col("id"),
          SignProjection(col("v"), planes, 2, 3).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      val naive = df.select(col("id") +: (0 until 2).map { t =>
          (0 until 3).map { j =>
            when(graft.llm.Similarity.dot(col("v"), typedLit(planes(t * 3 + j).toSeq)) >= 0,
              lit(1L << j)).otherwise(lit(0L))
          }.reduce(_.bitwiseOR(_)).as(s"s$t")
        }: _*)
        .collect().map(r => r.getLong(0) -> (1 to 2).map(r.getLong)).toMap
      kernel == naive
    })
  }

  test("RepGramStats ≡ plain-Scala gram reference on arbitrary text") {
    def ref(tk: Seq[String], topN: Int, dupN: Int): Seq[Long] = {
      val n = tk.length
      val mass = if (n >= topN) {
        val grams = (0 to n - topN).map(i => tk.slice(i, i + topN).mkString(" "))
        val counts = grams.groupBy(identity).map { case (g, o) => g -> o.size }
        val maxC = counts.values.max
        // ASCII test alphabet: String ordering = UTF8 byte order
        maxC.toLong * counts.filter(_._2 == maxC).keys.min.length
      } else 0L
      val cover = if (n >= dupN) {
        val grams = (0 to n - dupN).map(i => tk.slice(i, i + dupN).mkString(" "))
        val counts = grams.groupBy(identity).map { case (g, o) => g -> o.size }
        val covered = Array.fill(n)(false)
        for (i <- 0 to n - dupN if counts(grams(i)) >= 2; j <- i until i + dupN)
          covered(j) = true
        covered.count(identity).toLong
      } else 0L
      Seq(mass, cover)
    }
    check(Prop.forAll(docsGen, Gen.choose(1, 3), Gen.choose(2, 4)) {
      (rows, topN, dupN) =>
        val df = rows.toDF("doc_id", "text")
        val kernel = df.select(col("doc_id"),
            RepGramStats(split(col("text"), " "), topN, dupN).as("gs"))
          .as[(Long, Seq[Long])].collect().toMap
        rows.forall { case (id, text) =>
          kernel(id) == ref(text.split(" ", -1).toSeq, topN, dupN)
        }
    })
  }
}
