package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.concurrent.Future

/** Kernel-op parity (SURVEY §2.2/§2.5): the reference's DataPipelineT
  * fluent surface on in-memory fixtures. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def pipe(xs: Int*): Pipeline[Int] =
    Pipeline.fromSeq(spark, xs.toSeq)

  test("map transforms every element") {
    pipe(1, 2, 3).map(_ * 10).evalVector.sorted shouldBe Vector(10, 20, 30)
  }

  test("filter keeps matching elements") {
    pipe(1, 2, 3, 4).filter(_ % 2 == 0).evalVector.sorted shouldBe Vector(2, 4)
  }

  test("collectPf = filter + map in one") {
    pipe(1, 2, 3, 4)
      .collectPf { case x if x > 2 => x * 100 }
      .evalVector.sorted shouldBe Vector(300, 400)
  }

  test("flatMap produces 1→N") {
    pipe(1, 2).flatMap(x => Seq(x, x + 100)).evalVector.sorted shouldBe
      Vector(1, 2, 101, 102)
  }

  test("mapAsync preserves elements under bounded concurrency") {
    pipe(1 to 50: _*).mapAsync(parallelism = 4)(x => Future.successful(x * 2))
      .evalVector.sorted shouldBe (1 to 50).map(_ * 2).toVector
  }

  test("attempt routes per-element failures into rows (P6 handleError)") {
    val out = pipe(0, 1, 2).attempt(x => 10 / x).evalVector
    out.count(_.isOk) shouldBe 2
    val failed = out.filter(!_.isOk)
    failed should have size 1
    failed.head.errClass shouldBe Some("java.lang.ArithmeticException")
  }

  test("recoverMap collapses failures to a fallback value") {
    pipe(0, 1, 2).recoverMap(x => 10 / x)((_, _) => -1)
      .evalVector.sorted shouldBe Vector(-1, 5, 10)
  }

  test("distinct removes exact duplicates") {
    pipe(1, 1, 2, 2, 3).distinct.evalVector.sorted shouldBe Vector(1, 2, 3)
  }

  test("distinctBy keeps exactly the minimum element per key") {
    implicit val ord: Ordering[(String, Int)] = Ordering.by(_._2)
    val out = Pipeline.fromSeq(spark,
        Seq(("a", 3), ("a", 1), ("b", 2), ("b", 5)))
      .distinctBy(_._1).evalVector.sortBy(_._1)
    out shouldBe Vector(("a", 1), ("b", 2))
  }

  test("take(n) is deterministic top-k under the given order") {
    pipe(5, 3, 9, 1, 7).take(2, col("value").desc).evalVector shouldBe
      Vector(9, 7)
  }

  test("union / intersect / except match set semantics") {
    val a = pipe(1, 2, 3)
    val b = pipe(2, 3, 4)
    (a ++ b).evalVector.sorted shouldBe Vector(1, 2, 2, 3, 3, 4)
    a.intersect(b).evalVector.sorted shouldBe Vector(2, 3)
    a.except(b).evalVector shouldBe Vector(1)
  }

  test("evalReduce / evalSize terminal ops") {
    pipe(1, 2, 3, 4).evalReduce(_ + _) shouldBe 10
    pipe(1, 2, 3, 4).evalSize shouldBe 4
  }

  test("evalFold returns zero on empty, folds otherwise") {
    pipe(1, 2, 3).evalFold(100)(_ + _) shouldBe 106
    Pipeline.fromSeq(spark, Seq.empty[Int]).evalFold(42)(_ + _) shouldBe 42
  }

  test("typed join produces (A, B) pairs; joinLeft wraps misses in None") {
    val users = Pipeline.fromSeq(spark, Seq((1, "ann"), (2, "bob"), (3, "cy")))
    val orders = Pipeline.fromSeq(spark, Seq((1, 10.0), (1, 20.0), (3, 5.0)))
    val inner = users.join(orders, users("_1") === orders("_1"))
      .map { case ((uid, name), (_, amt)) => (uid, name, amt) }
      .evalVector.sorted
    inner shouldBe Vector((1, "ann", 10.0), (1, "ann", 20.0), (3, "cy", 5.0))
    val left = users.joinLeft(orders, users("_1") === orders("_1"))
      .map { case ((uid, _), o) => (uid, o.map(_._2).getOrElse(-1.0)) }
      .evalVector.sorted
    left.count(_._2 == -1.0) shouldBe 1   // bob has no orders
  }

  test("cross pairs everything with everything") {
    pipe(1, 2).cross(Pipeline.fromSeq(spark, Seq("a", "b"))).evalSize shouldBe 4
  }

  test("range source generates n elements") {
    Pipeline.range(spark, 5).evalVector.map(_.toLong).sorted shouldBe
      Vector(0L, 1L, 2L, 3L, 4L)
  }

  test("partitioning controls change partition counts, not contents") {
    val p = pipe(1 to 20: _*)
    val rep = p.repartition(7)
    rep.ds.rdd.getNumPartitions shouldBe 7
    rep.evalVector.sorted shouldBe (1 to 20).toVector
    val co = rep.coalesce(2)
    co.ds.rdd.getNumPartitions shouldBe 2
    co.evalVector.sorted shouldBe (1 to 20).toVector
    p.repartitionBy(col("value") % 3).evalVector.sorted shouldBe (1 to 20).toVector
  }
}
