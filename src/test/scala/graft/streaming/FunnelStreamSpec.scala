package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming funnel's two contracts: batch execution of the
  * transformWithState machine IS the batch fold (each user's whole
  * history arrives as one group — this is what lets stream_funnel carry
  * op_funnel's oracle), and a per-user-ordered multi-trigger stream
  * converges to the same depths (state carries across triggers). */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val steps = Seq("view", "click", "purchase")
  private val gapUs = 3000000000L // 50 min

  private val fixture: Seq[Event] = Seq(
    // user 1 completes: 20-min hops inside the gap
    Event(1L, ts(0), 1L, "view", 0.0, "{}"),
    Event(2L, ts(20), 1L, "click", 0.0, "{}"),
    Event(3L, ts(40), 1L, "purchase", 0.0, "{}"),
    // user 2 stalls at click: purchase lands outside the 50-min gap
    Event(4L, ts(0), 2L, "view", 0.0, "{}"),
    Event(5L, ts(20), 2L, "click", 0.0, "{}"),
    Event(6L, ts(125), 2L, "purchase", 0.0, "{}"),
    // user 3: purchase BEFORE click never counts
    Event(7L, ts(0), 3L, "view", 0.0, "{}"),
    Event(8L, ts(10), 3L, "purchase", 0.0, "{}"),
    Event(9L, ts(20), 3L, "click", 0.0, "{}"),
    // user 4: no first step
    Event(10L, ts(0), 4L, "error", 0.0, "{}"))

  private def truth: Map[Long, (Long, Option[Long])] =
    graft.relational.Funnel.funnel(fixture.toDF(), steps, gapUs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap

  test("batch execution of the state machine equals the batch fold") {
    val out = StreamOps.funnelStream(fixture.toDS(), steps, gapUs)
      .collect()
      .map(p => p.user_id -> ((p.steps_completed, p.completed_ts_us))).toMap
    out shouldBe truth
    truth(1L)._1 shouldBe 3L // the fixture exercises a completion…
    truth(2L)._1 shouldBe 2L // …a gap timeout…
    truth(3L)._1 shouldBe 2L // …and an order violation
    an[IllegalArgumentException] should be thrownBy
      StreamOps.funnelStream(fixture.toDS(), Seq.empty, gapUs)
  }

  test("per-user-ordered triggers converge to the batch fold (state crosses triggers)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Event]
      val q = StreamOps.funnelStream(mem.toDS(), steps, gapUs)
        .writeStream.format("memory").queryName("funnel_stream_sink")
        .outputMode("append").start()
      try {
        // two triggers split on global ts order (per-user ordered);
        // WITHIN each trigger arrival is scrambled — the processor's
        // (ts, tie) sort owns intra-trigger order
        val (t1, t2) = fixture.sortBy(_.ts.getTime).splitAt(6)
        mem.addData(t1.reverse)
        q.processAllAvailable()
        mem.addData(t2.reverse)
        q.processAllAvailable()
      } finally q.stop()
      val last = spark.table("funnel_stream_sink")
        .as[StreamOps.FunnelProgress].collect()
        .groupBy(_.user_id)
        // depth is monotone, so the deepest emission is the latest
        .map { case (u, rs) =>
          val r = rs.maxBy(_.steps_completed)
          u -> ((r.steps_completed, r.completed_ts_us))
        }
      last shouldBe truth
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
