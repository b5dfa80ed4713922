package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Context-length chunking: window/overlap layout, coverage, edge cases,
  * and the flatMap plan shape. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, c: Int, o: Int): Array[(Long, String, Long)] =
    Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"), c, o)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect()

  test("windows advance by stride and overlap by exactly O tokens") {
    // 10 tokens, C=4, O=2 → stride 2, nChunks = ceil(8/2) = 4
    val out = run("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", 4, 2)
    out shouldBe Array(
      (0L, "t0 t1 t2 t3", 4L),
      (1L, "t2 t3 t4 t5", 4L),
      (2L, "t4 t5 t6 t7", 4L),
      (3L, "t6 t7 t8 t9", 4L))
  }

  test("final chunk may be short, never empty; every token is covered") {
    // 7 tokens, C=3, O=0 → chunks of 3,3,1
    val out = run("a b c d e f g", 3, 0)
    out.map(_._3) shouldBe Array(3L, 3L, 1L)
    out.flatMap(_._2.split(" ")).toSet shouldBe "a b c d e f g".split(" ").toSet
  }

  test("a document shorter than one window yields exactly one chunk") {
    val out = run("only two", 16, 4)
    out shouldBe Array((0L, "only two", 2L))
  }

  test("heavy overlap on a short document still yields one full-coverage chunk") {
    // C=8, O=7 → stride 1; nt=3 < O: nChunks clamps to 1
    val out = run("x y z", 8, 7)
    out shouldBe Array((0L, "x y z", 3L))
  }

  test("chunk tokenizes by whitespace RUNS — the packing ops' token metric") {
    // "a\nb c" is 3 WsRun tokens; a single-space split would see 2 and
    // emit a chunk whose downstream WsRun count exceeds C
    val out = run("a\nb c", 2, 0)
    out shouldBe Array((0L, "a b", 2L), (1L, "c", 1L))
  }

  test("the tokens override windows AND slices the caller's array") {
    // subword-style override: each ws token splits into two halves. The
    // window math must run on the OVERRIDDEN array's length (4 subwords
    // → two 2-token chunks at C=2), and the slices must come from the
    // same array — a mis-wiring that windowed size(override) but sliced
    // the default split would emit the wrong text
    val docs = Seq((9L, "abcd efgh")).toDF("doc_id", "text")
    val halves = org.apache.spark.sql.functions.flatten(
      org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.split(col("text"), " "),
        w => org.apache.spark.sql.functions.array(
          w.substr(lit(1), lit(2)), w.substr(lit(3), lit(2)))))
    val out = Chunking.chunk(docs, chunkTokens = 2, overlap = 0,
        tokens = Some(halves))
      .orderBy("chunk_id").select("chunk_id", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect()
    out shouldBe Array((0L, "ab cd", 2L), (1L, "ef gh", 2L))
  }

  test("chunking is a pure flatMap projection — no shuffle, no join") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = Chunking.chunk(docs, 2, 1).queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
  }

  test("invalid window parameters fail fast") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy Chunking.chunk(docs, 0)
    an[IllegalArgumentException] should be thrownBy Chunking.chunk(docs, 4, 4)
    an[IllegalArgumentException] should be thrownBy Chunking.chunk(docs, 4, -1)
  }
}
