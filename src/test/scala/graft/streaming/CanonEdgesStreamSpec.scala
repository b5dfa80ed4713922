package graft.streaming

import graft.SparkSpec
import graft.llm.Components
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object CanonEdgesStreamSpec {
  final case class WEdge(src: String, dst_host: String, n_links: Long)
}

/** Streaming host canonicalization (r17, round-16 verdict ask 3):
  * componentsStream's maintained labels composed with the
  * llm_host_canon rewrite into a maintained canonical-edge snapshot.
  * Parity contract: after any batch, the stored table equals the BATCH
  * rewrite (closure + canon join + re-agg) over every edge ever seen —
  * including batches that MERGE components, which must re-key rows
  * written under the retired representative. Replay idempotence is a
  * batch-id watermark (edge sums are facts, not convergent state). */
class CanonEdgesStreamSpec extends SparkSpec {
  import spark.implicits._
  import CanonEdgesStreamSpec.WEdge

  // wave 1: {s1,s2,a.com,b.com} one component (rep a.com), {s3,x.com}
  // another (rep x.com). wave 2 MERGES them (s2 -> x.com), repeats an
  // edge pair (s1 -> a.com again), and grows a fresh pair (s9, z.com).
  private val wave1 = Seq(WEdge("s1", "a.com", 3L), WEdge("s1", "b.com", 2L),
    WEdge("s2", "b.com", 1L), WEdge("s3", "x.com", 5L))
  private val wave2 = Seq(WEdge("s2", "x.com", 4L), WEdge("s1", "a.com", 10L),
    WEdge("s9", "z.com", 7L))

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def canonAt(path: String): Map[(String, String), Long] =
    StreamOps.readCanonEdges(spark, path)
      .as[(String, String, Long)].collect()
      .map { case (s, h, n) => (s, h) -> n }.toMap

  /** The batch face: llm_host_canon's recipe over one edge set. */
  private def batchCanon(edges: Seq[WEdge]): Map[(String, String), Long] = {
    val e = edges.toDF("src", "dst_host", "n_links")
    val pairs = e.select(concat(lit("src:"), col("src")).as("a"),
      concat(lit("host:"), col("dst_host")).as("b"))
    val canon = Components.pairComponents(pairs, idCol = "node")
      .where(col("node").startsWith("host:"))
      .select(expr("substring(node, 6)").as("dst_host"),
        expr("substring(component, 6)").as("canon_host"))
    e.join(canon, "dst_host")
      .groupBy("src", "canon_host").agg(sum("n_links").as("n_links"))
      .as[(String, String, Long)].collect()
      .map { case (s, h, n) => (s, h) -> n }.toMap
  }

  private def apply1(batch: DataFrame, id: Long, labels: String,
                     canon: String, writer: String = "w1",
                     nBuckets: Int = 8): Unit =
    StreamOps.applyCanonBatch(batch, id, labels, canon, writer,
      "src", "dst_host", "n_links", nBuckets, 1L << 20)

  test("e2e stream: two waves equal the batch rewrite over all edges (merge re-keys)") {
    val labels = tmp("canon_l") + "/l"; val canon = tmp("canon_c") + "/c"
    val ckpt = tmp("canon_ck")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WEdge]
    val q = StreamOps.canonEdgesStream(mem.toDF(), labels, canon, ckpt,
      nBuckets = 8)
    try {
      mem.addData(wave1); q.processAllAvailable()
      canonAt(canon) shouldBe batchCanon(wave1)
      canonAt(canon) shouldBe Map(("s1", "a.com") -> 5L,
        ("s2", "a.com") -> 1L, ("s3", "x.com") -> 5L)
      mem.addData(wave2); q.processAllAvailable()
    } finally q.stop()
    // the merge retired x.com: its stored row must re-key onto a.com
    canonAt(canon) shouldBe batchCanon(wave1 ++ wave2)
    canonAt(canon) shouldBe Map(("s1", "a.com") -> 15L,
      ("s2", "a.com") -> 5L, ("s3", "a.com") -> 5L, ("s9", "z.com") -> 7L)
    // and the labels snapshot is the one-shot closure's
    spark.read.parquet(labels).as[(String, String)].collect().toMap
      .apply("host:x.com") shouldBe "host:a.com"
  }

  test("a bucket emptied by re-keying is deleted, not left stale (dynamic-overwrite gap)") {
    val labels = tmp("canon_eb_l") + "/l"; val canon = tmp("canon_eb_c") + "/c"
    apply1(wave1.toDF(), 0L, labels, canon)
    // x.com hashes to bucket 0 alone (a.com=1, b.com=2, z.com=4 at 8)
    val xBucket = spark.range(1).select(
      pmod(xxhash64(lit("x.com")), lit(8)).cast("int")).head().getInt(0)
    val dir = new java.io.File(canon, s"${StreamOps.CanonBucketCol}=$xBucket")
    dir.exists() shouldBe true
    apply1(wave2.toDF(), 1L, labels, canon)
    // every x.com row re-keyed to a.com's bucket; stale dir must be gone
    dir.exists() shouldBe false
    canonAt(canon) shouldBe batchCanon(wave1 ++ wave2)
  }

  test("replay: a batch id at or below the watermark folds nothing (labels still advance)") {
    val labels = tmp("canon_r_l") + "/l"; val canon = tmp("canon_r_c") + "/c"
    apply1(wave1.toDF(), 0L, labels, canon)
    apply1(wave2.toDF(), 1L, labels, canon)
    val once = canonAt(canon)
    apply1(wave2.toDF(), 1L, labels, canon) // at-least-once replay
    canonAt(canon) shouldBe once            // no double-count
    apply1(wave1.toDF(), 0L, labels, canon) // late replay of an older batch
    canonAt(canon) shouldBe once
  }

  test("crash, writer, and layout guards fail loudly") {
    val labels = tmp("canon_g_l") + "/l"; val canon = tmp("canon_g_c") + "/c"
    apply1(wave1.toDF(), 0L, labels, canon)
    // a second stream (different checkpoint-derived writer id) must not
    // interleave its batch watermarks with ours
    val eW = intercept[IllegalArgumentException] {
      apply1(wave2.toDF(), 0L, labels, canon, writer = "w2") }
    eW.getMessage should include ("writer")
    // a different bucket count would rewrite the wrong buckets
    val eB = intercept[IllegalArgumentException] {
      apply1(wave2.toDF(), 1L, labels, canon, nBuckets = 16) }
    eB.getMessage should include ("nBuckets")
    // an inflight marker above the watermark = the fold's overwrite
    // crashed mid-commit; buckets may be half moved
    java.nio.file.Files.write(
      java.nio.file.Paths.get(canon + ".inflight.meta"),
      "7\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val eC = intercept[IllegalArgumentException] {
      apply1(wave2.toDF(), 1L, labels, canon) }
    eC.getMessage should include ("inflight")
    // a stale marker (batch at/below the watermark) self-heals instead
    java.nio.file.Files.write(
      java.nio.file.Paths.get(canon + ".inflight.meta"),
      "0\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    apply1(wave2.toDF(), 1L, labels, canon)
    canonAt(canon) shouldBe batchCanon(wave1 ++ wave2)
    new java.io.File(canon + ".inflight.meta").exists() shouldBe false
  }
}
