package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** RewriteRangeJoin: a naive banded timestamp theta-join must plan as a
  * hash join with the rule active, produce exactly the naive results on
  * random data, and leave non-band joins untouched. */
class RewriteRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftExtensions.registerRules(spark)

  private def tsOf(min: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)

  // random event times over ~5 hours; repartition defeats local-relation
  // folding (rules must see a real join — auto-memory gotcha)
  private def frame(n: Int, seed: Long, idCol: String, tsCol: String): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, tsOf(rnd.nextInt(300))))
      .toDF(idCol, tsCol).repartition(3)
  }

  private def naivePairs(l: Seq[(Long, Timestamp)], r: Seq[(Long, Timestamp)],
                         wMs: Long): Set[(Long, Long)] =
    (for {
      (aid, at) <- l
      (bid, bt) <- r
      if bt.getTime > at.getTime && bt.getTime <= at.getTime + wMs
    } yield (aid, bid)).toSet

  test("band join plans as a hash join (no nested loop) and matches naive results") {
    val a = frame(120, 1L, "aid", "ts")
    val b = frame(80, 2L, "bid", "b_ts")
    val joined = a.join(b,
      col("b_ts") > col("ts") &&
        col("b_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    plan should include("__graft_rjb")
    val got = joined.select("aid", "bid").as[(Long, Long)].collect().toSet
    val expected = naivePairs(
      a.select("aid", "ts").as[(Long, Timestamp)].collect().toSeq,
      b.select("bid", "b_ts").as[(Long, Timestamp)].collect().toSeq,
      3600000L)
    got shouldBe expected
  }

  test("band orientation is symmetric: left-side b, right-side a also rewrites") {
    val a = frame(60, 3L, "aid", "ts")
    val b = frame(60, 4L, "bid", "b_ts")
    // b on the LEFT frame this time; same band semantics
    val joined = b.join(a,
      col("b_ts") > col("ts") &&
        col("b_ts") <= col("ts") + expr("INTERVAL 30 MINUTES"))
    joined.queryExecution.executedPlan.toString should not include "BroadcastNestedLoopJoin"
    val got = joined.select("aid", "bid").as[(Long, Long)].collect().toSet
    got shouldBe naivePairs(
      a.select("aid", "ts").as[(Long, Timestamp)].collect().toSeq,
      b.select("bid", "b_ts").as[(Long, Timestamp)].collect().toSeq,
      1800000L)
  }

  test("LEFT OUTER band join rewrites and preserves unmatched left rows once") {
    val a = frame(100, 9L, "aid", "ts")
    val b = frame(40, 10L, "bid", "b_ts")
    val joined = a.join(b,
      col("b_ts") > col("ts") &&
        col("b_ts") <= col("ts") + expr("INTERVAL 20 MINUTES"),
      "left_outer")
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("__graft_rjb")
    val got = joined.select("aid", "bid").as[(Long, Option[Long])].collect()
    val matched = naivePairs(
      a.select("aid", "ts").as[(Long, Timestamp)].collect().toSeq,
      b.select("bid", "b_ts").as[(Long, Timestamp)].collect().toSeq,
      1200000L)
    got.flatMap { case (x, y) => y.map(x -> _) }.toSet shouldBe matched
    // every left id appears; unmatched ones exactly once, with a null
    val unmatched = (0L until 100L).toSet -- matched.map(_._1)
    got.filter(_._2.isEmpty).map(_._1).sorted shouldBe unmatched.toSeq.sorted
  }

  test("LEFT OUTER with the band's probe on the RIGHT is left untouched") {
    val a = frame(20, 11L, "aid", "ts")
    val b = frame(20, 12L, "bid", "b_ts")
    // preserved (left) side is the b side → exploding it would duplicate
    // unmatched rows; the rule must not fire
    val joined = b.join(a,
      col("b_ts") > col("ts") &&
        col("b_ts") <= col("ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
    joined.queryExecution.executedPlan.toString should not include "__graft_rjb"
  }

  test("joins with an existing cross-side equality are left untouched") {
    val a = frame(20, 5L, "aid", "ts").withColumn("k", col("aid") % 3)
    val b = frame(20, 6L, "bid", "b_ts").withColumn("k2", col("bid") % 3)
    val joined = a.join(b,
      col("k") === col("k2") &&
        col("b_ts") > col("ts") &&
        col("b_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
    joined.queryExecution.executedPlan.toString should not include "__graft_rjb"
    joined.count() should be >= 0L // still executes
  }

  test("non-band theta joins are left untouched") {
    val a = frame(10, 7L, "aid", "ts")
    val b = frame(10, 8L, "bid", "b_ts")
    val joined = a.join(b, col("b_ts") > col("ts"))
    joined.queryExecution.executedPlan.toString should not include "__graft_rjb"
  }

  test("boundary semantics survive the rewrite: strict lower, inclusive upper") {
    val a = Seq((0L, tsOf(60))).toDF("aid", "ts").repartition(2)
    val b = Seq(
      (0L, tsOf(60)),   // == a.ts → excluded (strict >)
      (1L, tsOf(61)),   // inside
      (2L, tsOf(120)),  // == a.ts + 1h → included (<=)
      (3L, tsOf(121)))  // past the band
      .toDF("bid", "b_ts").repartition(2)
    val got = a.join(b,
        col("b_ts") > col("ts") &&
          col("b_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      .select("bid").as[Long].collect().toSet
    got shouldBe Set(1L, 2L)
  }
}
