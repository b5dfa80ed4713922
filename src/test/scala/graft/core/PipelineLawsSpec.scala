package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Kernel laws: the Pipeline facade must agree with plain Scala collection
  * semantics on arbitrary inputs — the fidelity claim of rebuilding a
  * collections-style library (SURVEY §2.2/§2.5) on a distributed engine.
  * Multiset ops compare sorted multisets; set ops (distinct/intersect/
  * except) follow the engine's documented DISTINCT semantics; positional
  * ops compare against the sorted sequence. Few cases per law (each case
  * is a Spark job), many laws.
  */
class PipelineLawsSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def check(p: Prop): Unit =
    assert(SCTest.check(params, p).passed, "property failed")

  private val ints: Gen[List[Int]] = Gen.listOfN(40, Gen.choose(-100, 100))
  private def pipe(xs: List[Int]): Pipeline[Int] = Pipeline.fromSeq(spark, xs)

  test("map/filter/flatMap/collectPf agree with Scala collections") {
    check(Prop.forAll(ints) { xs =>
      pipe(xs).map(_ * 2).evalVector.sorted == xs.map(_ * 2).sorted &&
      pipe(xs).filter(_ % 2 == 0).evalVector.sorted == xs.filter(_ % 2 == 0).sorted &&
      pipe(xs).flatMap(x => List(x, -x)).evalVector.sorted ==
        xs.flatMap(x => List(x, -x)).sorted &&
      pipe(xs).collectPf { case x if x > 0 => x + 1 }.evalVector.sorted ==
        xs.collect { case x if x > 0 => x + 1 }.sorted
    })
  }

  test("distinct and distinctBy agree with set semantics / min-per-key") {
    check(Prop.forAll(ints) { xs =>
      pipe(xs).distinct.evalVector.sorted == xs.distinct.sorted &&
      pipe(xs).distinctBy(x => math.abs(x % 7)).evalVector.sorted ==
        xs.groupBy(x => math.abs(x % 7)).values.map(_.min).toList.sorted
    })
  }

  test("union keeps multiplicity; intersect/except are DISTINCT set ops") {
    check(Prop.forAll(ints, ints) { (xs, ys) =>
      pipe(xs).union(pipe(ys)).evalVector.sorted == (xs ++ ys).sorted &&
      pipe(xs).intersect(pipe(ys)).evalVector.sorted ==
        (xs.toSet intersect ys.toSet).toList.sorted &&
      pipe(xs).except(pipe(ys)).evalVector.sorted ==
        (xs.toSet diff ys.toSet).toList.sorted
    })
  }

  test("take/evalFold/evalSize agree with sorted prefix / fold / size") {
    check(Prop.forAll(ints) { xs =>
      pipe(xs).take(5, col("value")).evalVector == xs.sorted.take(5) &&
      pipe(xs).evalFold(0)(_ + _) == xs.sum &&
      pipe(xs).evalSize == xs.length
    })
  }

  test("positional zipWithIndex/slice/drop follow the sorted order") {
    // distinct values: positional semantics need a total order
    val distinctInts = ints.map(_.distinct)
    check(Prop.forAll(distinctInts) { xs =>
      val df = xs.toDF("v")
      val indexed = Positional.zipWithIndex(df, Seq(col("v")))
        .orderBy("idx").select("v").as[Int].collect().toList
      val sliced = Positional.slice(df, Seq(col("v")), 2, 6)
        .select("v").as[Int].collect().toList.sorted
      val dropped = Positional.drop(df, Seq(col("v")), 3)
        .select("v").as[Int].collect().toList.sorted
      indexed == xs.sorted &&
      sliced == xs.sorted.slice(2, 6) &&
      dropped == xs.sorted.drop(3)
    })
  }

  test("positional zip truncates to the shorter side like Scala zip") {
    val distinctInts = ints.map(_.distinct)
    check(Prop.forAll(distinctInts, distinctInts) { (xs, ys) =>
      val out = Positional.zip(
          xs.toDF("x"), Seq(col("x")), ys.toDF("y"), Seq(col("y")))
        .orderBy("x").as[(Int, Int)].collect().toList
      out == (xs.sorted zip ys.sorted)
    })
  }
}
