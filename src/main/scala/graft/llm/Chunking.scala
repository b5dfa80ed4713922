package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-length chunking — the "split every document into ≤C-token
  * windows with O tokens of overlap" step that turns a curated corpus
  * into model-ready training rows (trembita has no analog; training-data
  * pipeline mandate).
  *
  * Whole operator is `sequence → explode → slice` over the token array —
  * a pure flatMap-shaped projection: NO shuffle, no UDF, and the explode
  * multiplies rows by ~nt/stride with each output row BOUNDED at C
  * tokens, so downstream partition sizing is deterministic (the one
  * operator property packing/batching needs). Slicing arithmetic is
  * integer and 1-based-inclusive in both engines, so the operator is
  * oracle-gated end-to-end.
  */
object Chunking {

  /** Chunk each document's whitespace tokens ([[TextStats.WsRun]] runs —
    * the same token metric the packing ops budget in) into windows of
    * `chunkTokens` advancing by `chunkTokens - overlap`:
    * chunk `i` covers tokens `[i·stride, i·stride + chunkTokens)`,
    * `nChunks = max(1, ceil((nt − overlap) / stride))` — the final chunk
    * may be short (never empty), a document shorter than one window
    * yields exactly one chunk, and every token of the document appears
    * in at least one chunk. Emits `(id, chunk_id, chunk_text, n_tokens)`
    * with `chunk_text` reassembled by single spaces (string output — the
    * oracle-comparator discipline bans array columns). */
  def chunk(docs: DataFrame, chunkTokens: Int, overlap: Int = 0,
            idCol: String = "doc_id", textCol: String = "text",
            tokens: Option[Column] = None): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val intDiv = graft.functions.VectorFunctions.intDiv _
    // WsRun tokenization, NOT single-space split: chunk feeds
    // packShards/packSequences, whose budgets count WsRun tokens — a
    // single-space tokenizer could emit chunks whose WsRun token count
    // exceeds C on multi-line text (round-7 review catch). `tokens`
    // overrides what gets windowed (e.g. [[TextStats.bpeTokens]] for
    // subword chunks).
    val t = tokens.getOrElse(split(col(textCol), TextStats.WsRun))
    val toks = docs.select(col(idCol), t.as("__toks"),
      size(t).cast("long").as("__nt"))
    val nChunks = greatest(lit(1L),
      intDiv(col("__nt") - overlap + (stride - 1), lit(stride.toLong)))
    val start = col("chunk_id") * stride // 0-based token offset of the window
    toks
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("__toks"), (start + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"),
        size(slice(col("__toks"), (start + 1).cast("int"), lit(chunkTokens)))
          .cast("long").as("n_tokens"))
  }
}
