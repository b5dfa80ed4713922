package graft.streaming

import graft.SparkSpec
import graft.model.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Batch/stream parity (SURVEY §2.8/§5.2): the same StreamOps logical plan
  * run over a static Dataset and over a MemoryStream must agree. The
  * 12-event two-user fixture has a >30-min gap per user so the session
  * window splits deterministically (FIXTURES.md micro-fixtures). */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")

  // user 1: events at 0,5,10 min then a 45-min gap then 55,60
  // user 2: events at 2,4 min then a 70-min gap then 74,76; plus late stragglers
  private val fixture: Seq[Event] = Seq(
    Event(0L, ts(0), 1L, "view", 10.0, """{"k":1}"""),
    Event(1L, ts(5), 1L, "click", 20.0, """{"k":2}"""),
    Event(2L, ts(10), 1L, "view", 30.0, """{"k":3}"""),
    Event(3L, ts(55), 1L, "purchase", 40.0, """{"k":4}"""),
    Event(4L, ts(60), 1L, "view", 50.0, """{"k":5}"""),
    Event(5L, ts(2), 2L, "view", 5.0, """{"k":6}"""),
    Event(6L, ts(4), 2L, "click", 6.0, """{"k":7}"""),
    Event(7L, ts(74), 2L, "view", 7.0, """{"k":8}"""),
    Event(8L, ts(76), 2L, "error", 8.0, """{"k":9}"""),
    Event(9L, ts(90), 1L, "view", 1.0, """{"k":10}"""),
    Event(10L, ts(91), 2L, "view", 2.0, """{"k":11}"""),
    Event(11L, ts(125), 1L, "click", 3.0, """{"k":12}"""))

  /** Run `op` over the fixture as a MemoryStream, complete-mode, collect. */
  private def streamed(op: DataFrame => DataFrame,
                       mode: String = "complete"): Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture)
    val q = op(mem.toDF())
      .writeStream.format("memory").queryName("parity_sink")
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table("parity_sink").collect()
  }

  private def batch(op: DataFrame => DataFrame): Array[org.apache.spark.sql.Row] =
    op(fixture.toDF()).collect()

  private def sortRows(rs: Array[org.apache.spark.sql.Row]): Seq[String] =
    rs.map(_.toString).sorted.toSeq

  test("tumbling window: stream equals batch") {
    val op = (df: DataFrame) => StreamOps.tumbling(df, "1 hour")
    sortRows(streamed(op)) shouldBe sortRows(batch(op))
  }

  test("tumbling window aggregates per (hour, type)") {
    val out = batch(df => StreamOps.tumbling(df, "1 hour"))
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // hour 0 views: e0(0), e2(10), e5(2)   hour 1 views: e4(60), e7(74), e9(90), e10(91)
    out should contain((ts(0), "view", 3L))
    out should contain((ts(60), "view", 4L))
  }

  test("windowed quantile sketch: stream equals batch at the queried rank") {
    // exact-mode GK summaries retain every value, so query(q) is a
    // deterministic function of the window's value SET — bytes may
    // differ by merge order, the queried quantiles cannot
    def digest(rows: Array[org.apache.spark.sql.Row]) =
      rows.map { r =>
        (r.getTimestamp(0), r.getLong(2),
          graft.functions.QuantileSketch.query(
            graft.functions.QuantileSketch.fromBytes(
              r.getAs[Array[Byte]]("sk")), 0.5).get)
      }.sortBy(_._1.getTime).toSeq
    val op = (df: DataFrame) => StreamOps.windowedQuantileSketch(df, "1 hour")
    digest(streamed(op)) shouldBe digest(batch(op))
    // hour 0 values {10,20,30,5,6}: disc median 10
    digest(batch(op)).head._3 shouldBe 10.0
  }

  test("sliding window: stream equals batch") {
    val op = (df: DataFrame) => StreamOps.sliding(df, "2 hours", "1 hour")
    sortRows(streamed(op)) shouldBe sortRows(batch(op))
  }

  test("session window: stream equals batch, splits on the gap") {
    val op = (df: DataFrame) => StreamOps.sessions(df, "30 minutes")
    sortRows(streamed(op)) shouldBe sortRows(batch(op))
    val sessions = batch(op).map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.length).toMap
    // session_window merges at exactly the gap boundary: the 90-min event
    // lands on the [55,60]-session's end (60+30) and joins it.
    sessions(1L) shouldBe 3   // {0,5,10}, {55,60,90}, {125}
    sessions(2L) shouldBe 2   // {2,4}, {74,76,91} (76→91 gap is only 15 min)
  }

  test("watermarked tumbling agg runs in append mode once watermark passes") {
    val rows = streamed(df => StreamOps.tumblingWithWatermark(df, "1 hour", "10 minutes"),
      mode = "append")
    // append emits only windows whose END ≤ watermark (max ts 2:05 → wm
    // 1:55): just hour 0. Hours 1 and 2 stay open in state.
    rows.map(_.getTimestamp(0)).toSet shouldBe Set(ts(0))
  }

  test("watermarked session windows emit only watermark-closed sessions in append mode") {
    val rows = streamed(df => StreamOps.sessionsWithWatermark(df, "30 minutes", "10 minutes"),
      mode = "append")
    // max ts 2:05 → watermark 1:55. Emitted sessions must have closed
    // (last event + 30min gap) before 1:55: user1 {0,5,10}→closes 0:40,
    // {55,60,90}→closes 1:20(? last 90min+30=2:00 > 1:55 NOT emitted);
    // user2 {2,4}→closes 0:34, {74,76,91}→closes 2:01 not emitted.
    val emitted = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    emitted shouldBe Set((1L, 3L), (2L, 2L))
  }

  test("stream-stream join: stream equals batch, state bounded by time range") {
    val views = (df: DataFrame) => df.where(col("event_type") === "view")
    val clicks = (df: DataFrame) => df.where(col("event_type") === "click")
    def join(l: DataFrame, r: DataFrame): DataFrame =
      StreamOps.streamStreamJoin(views(l), clicks(r),
          keyCol = "user_id", tsCol = "ts",
          lateness = "10 minutes", within = "10 minutes")
        .select("l_event_id", "r_event_id")
    // streaming: two MemoryStreams through the same op, append mode
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[Event]; val rMem = MemoryStream[Event]
    lMem.addData(fixture); rMem.addData(fixture)
    val q = join(lMem.toDF(), rMem.toDF())
      .writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamedRows = sortRows(spark.table("ssj_sink").collect())
    val batchRows = sortRows(join(fixture.toDF(), fixture.toDF()).collect())
    streamedRows shouldBe batchRows
    // hand check: view e0 (u1, 0:00) pairs with click e1 (u1, 0:05);
    // view e5 (u2, 0:02) with click e6 (u2, 0:04); no other click lands
    // within 10 minutes after a view.
    batchRows shouldBe Seq("[0,1]", "[5,6]")
  }

  test("streamStreamJoin batch-equals the op_join_range bucketed-band construction") {
    // the interval join's batch twin (r15 verdict ask 6): the same
    // key + time-band pairs must fall out of op_join_range's logic —
    // bucket-explode the build side by band-width buckets, then band +
    // key equality — run over the same fixture
    val views = fixture.toDF().where(col("event_type") === "view")
    val clicks = fixture.toDF().where(col("event_type") === "click")
    val viaStreamOp = StreamOps.streamStreamJoin(views, clicks,
        keyCol = "user_id", tsCol = "ts",
        lateness = "10 minutes", within = "10 minutes")
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    val probe = views.select(col("user_id"), col("event_id").as("l_id"),
        col("ts").as("l_ts"))
      .withColumn("h", floor(unix_timestamp(col("l_ts")) / 600))
    val build = clicks.select(col("user_id").as("r_user"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
      .withColumn("rh", floor(unix_timestamp(col("r_ts")) / 600))
      .withColumn("h", explode(array(col("rh"), col("rh") - 1)))
    val viaRangeJoin = probe.join(build,
        probe("h") === build("h") && col("user_id") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 10 minutes"))
      .select(col("l_id"), col("r_id"))
      .as[(Long, Long)].collect().toSet
    viaStreamOp shouldBe viaRangeJoin
    viaStreamOp shouldBe Set((0L, 1L), (5L, 6L))
  }

  test("dedupWithinWatermark drops duplicate keys inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture ++ fixture.take(3))   // re-send three duplicates
    val q = StreamOps.dedupWithinWatermark(mem.toDF(), "2 hours", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup_sink").select("event_id").as[Long].collect()
    ids.length shouldBe ids.toSet.size
    ids.toSet shouldBe fixture.map(_.event_id).toSet
  }

  test("file-source stream (Sources.stream) agrees with batch tumbling") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    fixture.toDF().write.mode("overwrite").parquet(dir)
    val streamDf = graft.sources.Sources
      .stream(spark, "parquet", fixture.toDF().schema).load(dir)
    val q = StreamOps.tumbling(streamDf, "1 hour")
      .writeStream.format("memory").queryName("file_sink")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    sortRows(spark.table("file_sink").collect()) shouldBe
      sortRows(batch(df => StreamOps.tumbling(df, "1 hour")))
  }

  test("parquet streaming sink with checkpoint round-trips (exactly-once shape)") {
    val base = java.nio.file.Files.createTempDirectory("graft_psink").toString
    fixture.toDF().write.mode("overwrite").parquet(s"$base/in")
    val streamDf = graft.sources.Sources
      .stream(spark, "parquet", fixture.toDF().schema).load(s"$base/in")
    val q = StreamOps.toParquet(
      streamDf.select("event_id", "user_id", "value"),
      s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(s"$base/out").count() shouldBe fixture.size
  }

  test("graft_product is callable from SQL after registration") {
    graft.functions.GraftExtensions.register(spark)
    spark.sql("SELECT graft_product(x) FROM VALUES (2.0), (3.0), (4.0) AS t(x)")
      .collect()(0).getDouble(0) shouldBe 24.0
  }

  test("curateStream gates, normalizes, and dedups within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOpsSpec.Doc]
    val sink = "curate_sink_" + System.nanoTime()
    val q = StreamOps.curateStream(mem.toDF(), lateness = "1 hour",
        targetLang = "en", minTokens = 2, maxTokens = 10, maxRepetition = 0.5)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      // batch 1: one good doc, one wrong-lang, one too-repetitive
      mem.addData(
        StreamOpsSpec.Doc(0L, ts(0), "en", "alpha beta gamma"),
        StreamOpsSpec.Doc(1L, ts(1), "de", "alpha beta gamma"),
        StreamOpsSpec.Doc(2L, ts(2), "en", "a b a b a b a b"))
      q.processAllAvailable()
      // batch 2: a reformatted copy of doc 0 (case + whitespace differ —
      // normalization makes it an exact content dup) and a fresh doc
      mem.addData(
        StreamOpsSpec.Doc(3L, ts(10), "en", "  Alpha   BETA gamma "),
        StreamOpsSpec.Doc(4L, ts(11), "en", "delta epsilon zeta"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table(sink).select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(0L, 4L) // 1 lang-gated, 2 rep-gated, 3 deduped
  }

  test("dedupAgainstSnapshot drops snapshot content and within-stream repeats") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "already in corpus"), (101L, "also known text"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[StreamOpsSpec.Doc]
    val sink = "incr_sink_" + System.nanoTime()
    val q = StreamOps.dedupAgainstSnapshot(mem.toDF(), corpus, lateness = "1 hour")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      mem.addData(
        StreamOpsSpec.Doc(0L, ts(0), "en", "fresh content one"),
        StreamOpsSpec.Doc(1L, ts(1), "en", "already in corpus"), // snapshot dup
        StreamOpsSpec.Doc(2L, ts(2), "en", "fresh content one")) // stream dup of 0
      q.processAllAvailable()
      mem.addData(
        StreamOpsSpec.Doc(3L, ts(10), "en", "also known text"), // snapshot dup, later batch
        StreamOpsSpec.Doc(4L, ts(11), "en", "fresh content two"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(sink).select("doc_id").as[Long].collect().toSet shouldBe Set(0L, 4L)
  }

  test("ingestStream: every gate fires, and survivors match the batch composite") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "known corpus document body here"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "omega psi chi phi")).toDF("doc_id", "text")
    val mem = MemoryStream[StreamOpsSpec.Doc]
    val sink = "ingest_sink_" + System.nanoTime()
    val q = StreamOps.ingestStream(mem.toDF(), corpus, bench,
        minQualityBp = 2000L, maxContamBp = 9000L, k = 3, lateness = "1 hour")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      mem.addData(
        StreamOpsSpec.Doc(101L, ts(0), "en", "known corpus document body here"), // snapshot dup
        StreamOpsSpec.Doc(102L, ts(1), "en", "alpha beta gamma delta"), // first fetch wins
        StreamOpsSpec.Doc(103L, ts(2), "en", "alpha beta gamma delta"), // stream dup of 102
        StreamOpsSpec.Doc(104L, ts(3), "en", "the the the the"), // quality 0
        StreamOpsSpec.Doc(105L, ts(4), "en", "omega psi chi phi"), // benchmark copy
        StreamOpsSpec.Doc(106L, ts(5), "en", "epsilon zeta eta theta")) // clean
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink)
      .select("doc_id", "quality_bp", "contamination_bp")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    streamed.map(_._1) shouldBe Array(102L, 106L)
    // the per-row contamination literal must agree with the batch
    // operator's aggregate formulation on identical inputs
    val batchOut = graft.llm.Curation.ingestDelta(
        spark.table(sink).sparkSession.createDataFrame(Seq(
          (101L, "known corpus document body here"),
          (102L, "alpha beta gamma delta"),
          (103L, "alpha beta gamma delta"),
          (104L, "the the the the"),
          (105L, "omega psi chi phi"),
          (106L, "epsilon zeta eta theta"))).toDF("doc_id", "text"),
        corpus, bench, minQualityBp = 2000L, maxContamBp = 9000L, k = 3)
      .select("doc_id", "quality_bp", "contamination_bp")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    streamed shouldBe batchOut
  }

  test("manifestStream partials fold to the batch manifest exactly") {
    implicit val sqlCtx = spark.sqlContext
    // 20 docs laid out by shuffleShards, streamed slab-per-batch in
    // global position order (the writer contract); the folded partial
    // manifests must equal the one-shot batch manifest column for column
    val docs = (0 until 20)
      .map(i => (i.toLong, s"body word number $i tail" + " pad" * (i % 3)))
      .toDF("doc_id", "text")
    val layout = graft.llm.Packing.shuffleShards(docs, rowsPerShard = 6L)
      .localCheckpoint()
    val ordered = layout.select("doc_id", "shard_id", "pos_in_shard", "text")
      .as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._2, r._3))
      .map { case (d, s, p, t) => StreamOpsSpec.Laid(d, s, p, t) }
    val base = java.nio.file.Files.createTempDirectory("graft_mstream").toString
    val mem = MemoryStream[StreamOpsSpec.Laid]
    val q = StreamOps.manifestStream(mem.toDF(),
      s"$base/manifests", s"$base/ckpt")
    try {
      ordered.grouped(7).foreach { slab =>
        mem.addData(slab.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val partials = spark.read.parquet(s"$base/manifests")
    partials.select("batch_id").distinct().count() should be >= 2L
    def canon(df: DataFrame): Seq[String] = df
      .select("shard_id", "n_docs", "n_tokens", "first_pos", "last_pos",
        "checksum", "contiguous")
      .withColumn("checksum", col("checksum").cast("string"))
      .collect().map(_.toString).sorted.toSeq
    canon(graft.llm.Audit.mergeManifests(partials)) shouldBe
      canon(graft.llm.Audit.shardManifest(layout))
  }

  test("manifestStream's per-batch write is idempotent under at-least-once replay") {
    // foreachBatch can replay a batch whose write landed but whose offset
    // commit didn't — the sink's dynamic partition overwrite by batch_id
    // must leave exactly one copy of the replayed partials, so the
    // merged manifest (which folds by shard, not batch) never
    // double-counts. Drive the extracted per-batch write directly: batch
    // 0 once, batch 1 twice (the replay), then fold.
    val layout = graft.llm.Packing.shuffleShards(
        (0 until 12).map(i => (i.toLong, s"w$i body $i")).toDF("doc_id", "text"),
        rowsPerShard = 4L)
      .localCheckpoint()
    val slabs = layout.select("doc_id", "shard_id", "pos_in_shard", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._2, r._3))
    val (b0, b1) = slabs.splitAt(5)
    def frame(rows: Array[(Long, Long, Long, String)]): DataFrame =
      rows.toSeq.toDF("doc_id", "shard_id", "pos_in_shard", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_mreplay").toString
    val path = s"$base/manifests"
    val run = StreamOps.runIdOf(s"$base/ckpt")
    def write(rows: Array[(Long, Long, Long, String)], id: Long,
              runId: String = run): Unit =
      StreamOps.writeManifestPartial(frame(rows), id, runId, path,
        "shard_id", "pos_in_shard", "text", None)
    write(b0, 0L); write(b1, 1L); write(b1, 1L) // batch 1 replayed
    val partials = spark.read.parquet(path)
    partials.groupBy("run_id", "batch_id", "shard_id").count()
      .agg(max("count")).as[Long].head() shouldBe 1L
    // run_id is the checkpoint's identity: stable across a restart of the
    // same stream, distinct for a second writer on another checkpoint
    StreamOps.runIdOf(s"$base/ckpt") shouldBe run
    StreamOps.runIdOf(s"$base/other_ckpt") should not be run
    // non-ASCII paths: the hash must cover ALL UTF-8 bytes, not just the
    // first charCount bytes. These two paths differ only in the final
    // 2-byte Greek char, whose bytes lie entirely past the char count —
    // the pre-r12 prefix hash collided here (and the sanitized readable
    // tails are identical, so the hash is the only separator)
    StreamOps.runIdOf(s"$base/αβ") should not be StreamOps.runIdOf(s"$base/αγ")
    def canon(df: DataFrame): Seq[String] = df
      .select("shard_id", "n_docs", "n_tokens", "first_pos", "last_pos",
        "checksum", "contiguous")
      .withColumn("checksum", col("checksum").cast("string"))
      .collect().map(_.toString).sorted.toSeq
    canon(graft.llm.Audit.mergeManifests(partials)) shouldBe
      canon(graft.llm.Audit.shardManifest(layout))
    // a second writer (different checkpoint → different run_id) writing
    // its own batch 1 must not clobber the first writer's batch-1
    // partials — the cross-writer overwrite the run_id partition exists
    // to prevent
    val before = spark.read.parquet(path)
      .where(col("run_id") === run).count()
    write(b0, 1L, StreamOps.runIdOf(s"$base/other_ckpt"))
    spark.read.parquet(path)
      .where(col("run_id") === run).count() shouldBe before
  }

  test("ingestStream fails fast on an un-collectable benchmark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOpsSpec.Doc]
    val corpus = Seq((1L, "x")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      StreamOps.ingestStream(mem.toDF(), corpus, bench,
        minQualityBp = 0L, maxContamBp = 10000L, maxBenchShingles = 2)
  }

  test("budgetAdmission admits per-stratum until the budget, straddler kept, state crosses batches") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.DocIn
    val mem = MemoryStream[DocIn]
    val q = StreamOps.budgetAdmission(mem.toDS(), budgetTokens = 7L)
      .writeStream.format("memory").queryName("budget_sink")
      .outputMode("append").start()
    try {
      // batch 1, source a: 3+3 tokens — d1 (start 0), d2 (start 3) admitted
      mem.addData(
        DocIn(1L, "a", "x y z"), DocIn(2L, "a", "p q r"),
        DocIn(10L, "b", "a b c d e f"))
      q.processAllAvailable()
      // batch 2: a has consumed 6 < 7 → d3 straddles (start 6, kept),
      // d4 (start 10) dropped; b consumed 6 < 7 → d11 kept, then full
      mem.addData(
        DocIn(3L, "a", "l m n o"), DocIn(4L, "a", "u v"),
        DocIn(11L, "b", "g h"), DocIn(12L, "b", "i"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("budget_sink")
      .orderBy("doc_id")
      .select("doc_id", "source", "n_tokens", "start_offset")
      .as[(Long, String, Long, Long)].collect()
    out shouldBe Array(
      (1L, "a", 3L, 0L), (2L, "a", 3L, 3L), (3L, "a", 4L, 6L),
      (10L, "b", 6L, 0L), (11L, "b", 2L, 6L))
  }

  test("budgetAdmission start-offset rule matches the batch operator's on aligned order") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.DocIn
    // ids chosen so doc_id order == shuffleHash order is NOT required:
    // we assert the RULE (start < budget), not set-parity — the
    // ordering caveat is the documented contract
    val docs = Seq(
      DocIn(1L, "s", "a b"), DocIn(2L, "s", "c d e"), DocIn(3L, "s", "f"))
    val mem = MemoryStream[DocIn]
    val q = StreamOps.budgetAdmission(mem.toDS(), budgetTokens = 4L)
      .writeStream.format("memory").queryName("budget_rule_sink")
      .outputMode("append").start()
    try { mem.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val admitted = spark.table("budget_rule_sink")
      .select("doc_id", "start_offset").as[(Long, Long)].collect().toMap
    // starts in doc_id order: 0, 2, 5 → d3's start 5 >= 4 dropped
    admitted shouldBe Map(1L -> 0L, 2L -> 2L)
  }

  test("runningPerUser keyed state accumulates per user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture)
    val q = StreamOps.runningPerUser(mem.toDS())
      .writeStream.format("memory").queryName("state_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val u1 = fixture.filter(_.user_id == 1L)
    spark.table("state_sink").where(col("user_id") === 1L)
      .agg(max("n")).as[Long].head() shouldBe u1.length
  }
}

object StreamOpsSpec {
  /** Document-stream row for the curateStream spec (top-level so the
    * MemoryStream encoder derives). */
  final case class Doc(doc_id: Long, ts: java.sql.Timestamp,
                       lang: String, text: String)

  /** Laid-out layout row for the manifestStream spec. */
  final case class Laid(doc_id: Long, shard_id: Long, pos_in_shard: Long,
                        text: String)
}
