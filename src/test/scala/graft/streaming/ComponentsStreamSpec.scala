package graft.streaming

import graft.SparkSpec
import graft.llm.Components
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object ComponentsStreamSpec {
  final case class Edge(a: Long, b: Long)
}

/** Streaming components (r16): an edge stream maintains the labeling
  * the one-shot closure would compute over all edges ever seen —
  * per-batch cost rides the star contraction, replay safety is
  * algebraic (re-adding merged edges is the identity). */
class ComponentsStreamSpec extends SparkSpec {
  import spark.implicits._
  import ComponentsStreamSpec.Edge

  // wave 1: chains {1,2,3} and {5,6}; wave 2 merges them (3-5), grows
  // a fresh pair (20-21), and repeats an already-merged edge (2-3)
  private val wave1 = Seq(Edge(2L, 1L), Edge(2L, 3L), Edge(5L, 6L))
  private val wave2 = Seq(Edge(3L, 5L), Edge(20L, 21L), Edge(2L, 3L))

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def labelsAt(path: String): Map[Long, Long] =
    spark.read.parquet(path).as[(Long, Long)].collect().toMap

  test("e2e stream: two waves equal the one-shot closure over all edges") {
    val labels = tmp("cc_labels") + "/nested"; val ckpt = tmp("cc_ckpt")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Edge]
    val q = StreamOps.componentsStream(mem.toDF(), labels, ckpt)
    try {
      mem.addData(wave1); q.processAllAvailable()
      labelsAt(labels) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L)
      mem.addData(wave2); q.processAllAvailable()
    } finally q.stop()
    val streamed = labelsAt(labels)
    val oneShot = Components.pairComponents(
        (wave1 ++ wave2).toDF("a", "b"), idCol = "node")
      .as[(Long, Long)].collect().toMap
    streamed shouldBe oneShot
    streamed shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L,
      20L -> 20L, 21L -> 20L)
  }

  test("the labels store is claimed (r19): a concurrent second stream bounces; release recovers") {
    // labels CONVERGE under serialized batches, but two concurrent
    // streams read-fold-overwrite — the loser's edges never come back
    // (its checkpoint advanced); the atomic claim turns that silent
    // loss into a loud failure at the second stream's first batch
    val labels = tmp("cc_claim") + "/labels"
    StreamOps.applyComponentsBatch(wave1.toDF(), labels, "a", "b", "node",
      1L << 20, writer = "wA")
    val e = intercept[IllegalArgumentException] {
      StreamOps.applyComponentsBatch(wave2.toDF(), labels, "a", "b", "node",
        1L << 20, writer = "wB") }
    e.getMessage should include ("maintained by writer wA")
    // lost checkpoint: release with the stream stopped (labels are
    // monotone state — any stream may resume them once solo)
    StreamOps.releaseStoreClaim(spark, labels)
    StreamOps.applyComponentsBatch(wave2.toDF(), labels, "a", "b", "node",
      1L << 20, writer = "wB")
    labelsAt(labels) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      6L -> 1L, 20L -> 20L, 21L -> 20L)
  }

  test("replay: re-applying a batch is the identity on the labeling") {
    val labels = tmp("cc_replay")
    StreamOps.applyComponentsBatch(wave1.toDF(), labels, "a", "b", "node", 1L << 20)
    StreamOps.applyComponentsBatch(wave2.toDF(), labels, "a", "b", "node", 1L << 20)
    val once = labelsAt(labels)
    StreamOps.applyComponentsBatch(wave2.toDF(), labels, "a", "b", "node", 1L << 20)
    labelsAt(labels) shouldBe once
  }

  test("crashed label overwrite fails loudly instead of re-closing from this batch alone") {
    val labels = tmp("cc_crash")
    StreamOps.applyComponentsBatch(wave1.toDF(), labels, "a", "b", "node", 1L << 20)
    // simulate the crash: data gone, sibling marker survives
    new java.io.File(labels).listFiles().foreach(_.delete())
    val e = intercept[IllegalArgumentException] {
      StreamOps.applyComponentsBatch(wave2.toDF(), labels, "a", "b", "node", 1L << 20) }
    e.getMessage should include ("crashed mid-write")
  }

  test("maxNodes fails fast instead of growing an unbounded label snapshot") {
    val labels = tmp("cc_cap")
    val big = spark.range(100).select(col("id").as("a"), (col("id") + 1).as("b"))
    an[IllegalArgumentException] should be thrownBy
      StreamOps.applyComponentsBatch(big, labels, "a", "b", "node", maxNodes = 10L)
    // and the failed batch must not have written a partial snapshot
    new java.io.File(labels).listFiles()
      .count(_.getName.endsWith(".parquet")) shouldBe 0
  }
}
