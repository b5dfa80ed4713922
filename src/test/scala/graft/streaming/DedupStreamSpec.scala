package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object DedupStreamSpec {
  final case class Doc(doc_id: Long, text: String)
}

/** Streaming near-dedup (r17): a document stream maintains a deduped
  * corpus + its stored signature index. Candidates come from probing
  * the index (never re-hashing the corpus), verification is exact
  * k-gram Jaccard over bucket-pruned corpus text, survivors append to
  * both stores — corpus as CDC state (replay = merge fixed point),
  * signatures as batch-keyed partitions (replay = same overwrite). */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._
  import DedupStreamSpec.Doc

  // distinct long texts: near-dup detection at threshold 0.5 / k=2
  // needs real shingle sets; t(i) and t(j) share no tokens for i != j
  private def t(i: Int): String =
    (0 until 16).map(w => s"w${i}x$w").mkString(" ")

  private def corpus0 = Seq(Doc(1L, t(1)), Doc(2L, t(2)), Doc(3L, t(3))).toDF()
  // batch 1: 10 = exact dup of corpus doc 1; 11 fresh; 12 = near-clone
  // of 11 (one trailing token differs -> jaccard 15/17, the higher side
  // of a within-batch pair); 13 fresh
  private def batch1 = Seq(
    Doc(10L, t(1)),
    Doc(11L, t(11)),
    Doc(12L, t(11) + " zq"),
    Doc(13L, t(13)))
  // batch 2: 20 = exact dup of batch-1 SURVIVOR 11 (cross-batch state);
  // 21 fresh; 22 = exact dup of corpus doc 3
  private def batch2 = Seq(
    Doc(20L, t(11)),
    Doc(21L, t(21)),
    Doc(22L, t(3)))

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def ids(corpusPath: String): Seq[Long] =
    StreamOps.readDedupCorpus(spark, corpusPath)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def apply1(idx: String, corp: String, b: Seq[Doc], id: Long,
                     writer: String = "default"): Unit =
    StreamOps.applyDedupBatch(b.toDF(), id, idx, corp, k = 2, bands = 8,
      rowsPerBand = 2, threshold = 0.5, nBuckets = 8, idCol = "doc_id",
      textCol = "text", poly = false, writer = writer)

  test("e2e stream: dups vs corpus, within batch, and vs earlier-batch survivors all drop") {
    val dir = tmp("dedup_stream"); val idx = s"$dir/idx"; val corp = s"$dir/corp"
    StreamOps.bootstrapDedup(corpus0, idx, corp, k = 2, bands = 8,
      rowsPerBand = 2, nBuckets = 8)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamOps.dedupStream(mem.toDF(), idx, corp, tmp("dedup_ckpt"),
      k = 2, bands = 8, rowsPerBand = 2, threshold = 0.5, nBuckets = 8)
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    // 10 dropped (corpus dup), 12 dropped (within-batch higher side),
    // 20 dropped (dup of survivor 11 — proves the index grew), 22
    // dropped (corpus dup); 11, 13, 21 survive
    ids(corp) shouldBe Seq(1L, 2L, 3L, 11L, 13L, 21L)
    // the index holds signatures for corpus + survivors only
    val idxIds = spark.read.parquet(idx).select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    idxIds shouldBe Seq(1L, 2L, 3L, 11L, 13L, 21L)
  }

  test("at-least-once replay: re-applying a batch converges to the same stores") {
    val dir = tmp("dedup_replay"); val idx = s"$dir/idx"; val corp = s"$dir/corp"
    StreamOps.bootstrapDedup(corpus0, idx, corp, k = 2, bands = 8,
      rowsPerBand = 2, nBuckets = 8)
    apply1(idx, corp, batch1, 0L)
    def state = (ids(corp),
      spark.read.parquet(idx).orderBy("doc_id", "band")
        .collect().map(_.toString).toSeq)
    val once = state
    apply1(idx, corp, batch1, 0L) // the redelivered batch
    state shouldBe once
  }

  test("crash between corpus write and index write heals on redelivery") {
    val dir = tmp("dedup_crash"); val idx = s"$dir/idx"; val corp = s"$dir/corp"
    StreamOps.bootstrapDedup(corpus0, idx, corp, k = 2, bands = 8,
      rowsPerBand = 2, nBuckets = 8)
    apply1(idx, corp, batch1, 0L)
    // simulate the crash: the corpus committed but batch 0's index
    // partition did not (corpus commits FIRST by design) — partitions
    // are (writer, batch)-keyed per the r11 idempotent-sink rule
    val part = new java.io.File(idx,
      s"${StreamOps.DedupWriterCol}=default/${StreamOps.DedupBatchCol}=0")
    part.exists() shouldBe true
    part.listFiles().foreach(_.delete()); part.delete() shouldBe true
    apply1(idx, corp, batch1, 0L) // redelivery
    ids(corp) shouldBe Seq(1L, 2L, 3L, 11L, 13L)
    part.exists() shouldBe true
    // and dups of the survivors are still caught afterwards
    apply1(idx, corp, batch2, 1L)
    ids(corp) shouldBe Seq(1L, 2L, 3L, 11L, 13L, 21L)
  }

  test("cold start: no bootstrap — first batch self-dedups and creates both stores") {
    val dir = tmp("dedup_cold"); val idx = s"$dir/idx"; val corp = s"$dir/corp"
    apply1(idx, corp, batch1, 0L)
    ids(corp) shouldBe Seq(10L, 11L, 13L) // no corpus to match; 12 drops within
    apply1(idx, corp, batch2, 1L)
    ids(corp) shouldBe Seq(10L, 11L, 13L, 21L, 22L) // 20 dups survivor 11
  }

  test("compactDedupIndex folds batch partitions; probing still works") {
    val dir = tmp("dedup_compact"); val idx = s"$dir/idx"; val corp = s"$dir/corp"
    StreamOps.bootstrapDedup(corpus0, idx, corp, k = 2, bands = 8,
      rowsPerBand = 2, nBuckets = 8)
    apply1(idx, corp, batch1, 0L)
    val rowsBefore = spark.read.parquet(idx).count()
    StreamOps.compactDedupIndex(spark, idx)
    val parts = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .flatMap(w => w.listFiles().filter(_.isDirectory)
        .map(b => s"${w.getName}/${b.getName}")).toSeq
    parts shouldBe Seq(
      s"${StreamOps.DedupWriterCol}=compact/${StreamOps.DedupBatchCol}=-1")
    spark.read.parquet(idx).count() shouldBe rowsBefore
    apply1(idx, corp, batch2, 1L)
    ids(corp) shouldBe Seq(1L, 2L, 3L, 11L, 13L, 21L)
  }

  test("a second writer's batch 0 cannot clobber the first's index partition") {
    // the r11 idempotent-sink rule: batch ids restart at 0 under a
    // fresh stream checkpoint, so partitions are (writer, batch)-keyed
    // — batch-id-only partitions would let writer 2's first batch
    // dynamically overwrite writer 1's, silently deleting those
    // survivors' signatures
    val dir = tmp("dedup_writers"); val idx = s"$dir/idx"; val corp = s"$dir/corp"
    StreamOps.bootstrapDedup(corpus0, idx, corp, k = 2, bands = 8,
      rowsPerBand = 2, nBuckets = 8)
    apply1(idx, corp, batch1, 0L, writer = "w1") // survivors 11, 13
    apply1(idx, corp, Seq(Doc(40L, t(40))), 0L, writer = "w2") // same batch id
    // w1's partition survived w2's batch 0...
    new java.io.File(idx,
      s"${StreamOps.DedupWriterCol}=w1/${StreamOps.DedupBatchCol}=0")
      .exists() shouldBe true
    // ...so a dup of w1's survivor 11 is still caught
    apply1(idx, corp, Seq(Doc(50L, t(11))), 1L, writer = "w2")
    ids(corp) shouldBe Seq(1L, 2L, 3L, 11L, 13L, 40L)
  }

  test("retraction: a CDC delete frees the content; compact GCs the stale sigs") {
    val dir = tmp("dedup_retract"); val idx = s"$dir/idx"; val corp = s"$dir/corp"
    StreamOps.bootstrapDedup(corpus0, idx, corp, k = 2, bands = 8,
      rowsPerBand = 2, nBuckets = 8)
    // doc 1 leaves the corpus through the CDC store's own machinery
    val retract = Seq((1L, null.asInstanceOf[String], 100L, "D"))
      .toDF("doc_id", "text", "version", "op")
    StreamOps.applyCdcBatch(retract, corp, Seq("doc_id"), "version", "op", 8)
    ids(corp) shouldBe Seq(2L, 3L)
    // doc 1's index rows are stale but BENIGN: a clone of its text is
    // correctly ADMITTED (verification fetches current text and finds
    // none), while a clone of live doc 2 still drops
    apply1(idx, corp, Seq(Doc(30L, t(1)), Doc(31L, t(2))), 0L)
    ids(corp) shouldBe Seq(2L, 3L, 30L)
    // compaction with the corpus GCs the retracted doc's signatures
    spark.read.parquet(idx).where(col("doc_id") === 1L).count() should be > 0L
    StreamOps.compactDedupIndex(spark, idx, Some(corp))
    spark.read.parquet(idx).where(col("doc_id") === 1L).count() shouldBe 0L
    spark.read.parquet(idx).select("doc_id").distinct().count() shouldBe 3L
  }

  test("docs carrying the store's internal merge columns are rejected") {
    val dir = tmp("dedup_cols")
    val bad = Seq((1L, "x", 1L)).toDF("doc_id", "text", "version")
    val e = intercept[IllegalArgumentException] {
      StreamOps.applyDedupBatch(bad, 0L, s"$dir/idx", s"$dir/corp", 2, 8, 2,
        0.5, 8, "doc_id", "text", poly = false) }
    e.getMessage should include ("version")
  }
}
