package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Aggregator algebra (SURVEY §2.4): custom aggregates + QL builder, plus
  * ScalaCheck laws for the add/combine/extract algebra — merge must be
  * associative and commutative or map-side partial aggregation would be
  * order-dependent at scale. */
class AggsSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed, "property failed")

  test("product aggregator multiplies group values") {
    val df = Seq(("a", 2.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v")
    val out = df.groupBy("k").agg(Aggs.productCol(col("v")).as("p"))
      .orderBy("k").as[(String, Double)].collect()
    out shouldBe Array(("a", 6.0), ("b", 5.0))
  }

  test("product merge is associative and commutative (ScalaCheck)") {
    val g = Gen.choose(-8.0, 8.0)
    val m = Aggs.product.merge _
    check(Prop.forAll(g, g, g) { (a, b, c) =>
      math.abs(m(m(a, b), c) - m(a, m(b, c))) < 1e-9 && m(a, b) == m(b, a)
    })
  }

  test("rms computes sqrt(mean(x^2))") {
    val df = Seq(3.0, 4.0).toDF("v")
    val rms = df.agg(Aggs.rms(col("v"))).as[Double].head()
    rms shouldBe math.sqrt((9.0 + 16.0) / 2) +- 1e-12
  }

  test("stringAgg is deterministic regardless of input order") {
    val df1 = Seq("b", "a", "c").toDF("v")
    val df2 = Seq("c", "b", "a").toDF("v").repartition(3)
    val s1 = df1.agg(Aggs.stringAgg(col("v"), ",")).as[String].head()
    val s2 = df2.agg(Aggs.stringAgg(col("v"), ",")).as[String].head()
    s1 shouldBe "a,b,c"
    s2 shouldBe s1
  }

  test("arrSorted normalizes collected order") {
    val df = Seq(("g", 3), ("g", 1), ("g", 2)).toDF("k", "v").repartition(3)
    df.groupBy("k").agg(Aggs.arrSorted(col("v")).as("a"))
      .as[(String, Seq[Int])].head()._2 shouldBe Seq(1, 2, 3)
  }

  test("firstBy picks the value at the minimum order key") {
    val df = Seq(("g", "x", 2), ("g", "y", 1), ("g", "z", 3)).toDF("k", "v", "o")
    df.groupBy("k").agg(Aggs.firstBy(col("v"), col("o")).as("f"))
      .as[(String, String)].head()._2 shouldBe "y"
  }

  test("foldAggregator obeys the fold for any op (ScalaCheck)") {
    val agg = Aggs.foldAggregator(Int.MinValue)(math.max)
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1000, 1000))) { xs =>
      agg.finish(xs.foldLeft(agg.zero)(agg.reduce)) == xs.max
    })
  }

  test("foldAggregator applies a NON-identity zero exactly once, any partitioning") {
    // the old form folded zero into EVERY partition's buffer: z=10 over
    // [1,2,3] in 3 partitions returned 36 instead of 16 and varied with
    // the partition count (the identity-zero property above masked it)
    val agg = Aggs.foldAggregator(10)(_ + _)
    for (parts <- Seq(1, 3, 7)) {
      spark.range(3).select((col("id") + 1).cast("int").as("v"))
        .repartition(parts)
        .as[Int].select(agg.toColumn).head() shouldBe 16
    }
    // empty input folds to exactly z
    spark.emptyDataset[Int].select(agg.toColumn).head() shouldBe 10
  }

  test("product skips SQL NULLs like every built-in aggregate") {
    // a null used to decode as 0.0 and zero the whole group's product
    val df = Seq(("a", Some(2.0)), ("a", None), ("b", Some(5.0)))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(Aggs.productCol(col("v")).as("p"))
      .orderBy("k").as[(String, Double)].collect()
    out shouldBe Array(("a", 2.0), ("b", 5.0))
  }

  test("Ql builder: where → groupBy → aggregate → having → orderBy") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 100))
      .toDF("k", "v")
    val out = Ql(df)
      .where(col("v") < 50)
      .groupBy(col("k"))
      .aggregate(sum(col("v")).cast("int").as("s"), count(lit(1)).as("n"))
      .having(col("s") > 2)
      .orderBy(col("k"))
      .result.as[(String, Int, Long)].collect()
    out shouldBe Array(("a", 3, 2L), ("b", 7, 2L))
  }

  test("Ql with no keys produces a global aggregate") {
    val df = Seq(1, 2, 3).toDF("v")
    Ql(df).aggregate(sum(col("v")).cast("int").as("s")).result
      .as[Int].head() shouldBe 6
  }

  test("Ql.resultAs maps grouped rows to a case class by column name") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = Ql(df)
      .groupBy(col("k"))
      .aggregate(sum(col("v")).cast("long").as("s"), count(lit(1)).as("n"))
      .orderBy(col("k"))
      .resultAs[KeyAgg]
      .collect()
    out shouldBe Array(KeyAgg("a", 3L, 2L), KeyAgg("b", 3L, 1L))
  }
}

/** Target shape for Ql.resultAs — the trembita-ql QueryResult→case-class
  * conversion (SURVEY §3 EP3 step 4). */
final case class KeyAgg(k: String, s: Long, n: Long)
