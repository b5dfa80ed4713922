package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenizer over a FIXED vocabulary —
  * WordPiece-style inference, the deterministic stand-in for a learned
  * BPE tokenizer (the merge TABLE is data; applying it is pure string
  * matching). Real context-length budgets are subword tokens, not
  * whitespace runs — a whitespace proxy under-fills blocks ~1.3–1.5× on
  * prose — and because greedy longest-match is plain substring
  * arithmetic, the whole packing tier stays DuckDB-oracle-able when
  * budgets switch to it (a learned merge-order BPE would not be).
  *
  * Semantics, per whitespace word (the [[graft.llm.TextStats.WsRun]]
  * split happens OUTSIDE the kernel, in the shared tokenization idiom):
  * at each position take the LONGEST vocab entry matching there and
  * advance by it; if none matches, the single code point is its own
  * token. Greedy longest-match depends only on the vocab SET (not its
  * order), so the result is deterministic under any vocab listing.
  * Matching is by Unicode code point, the unit DuckDB's substr/length
  * count, so cross-engine parity holds beyond ASCII.
  *
  * Scale shape: the vocab compiles ONCE into a code-point trie carried
  * by the expression (`addReferenceObj` — the static-kernel discipline),
  * so the per-row walk is O(word length × longest token), allocation-free
  * except the per-word String decode; both kernels run inside
  * whole-stage codegen as one narrow projection. Sized for real
  * vocabularies (a 50k-entry trie is ~MBs, broadcast once with the
  * plan), not just planted test vocabs.
  */
final class BpeTrie(weighted: Seq[(String, Long)]) extends Serializable {

  private final class Node extends Serializable {
    var terminal: Boolean = false
    var weight: Long = 0L // unigram piece score; 0 for unweighted vocabs
    var kids: java.util.HashMap[Integer, Node] = null
    def child(cp: Int): Node = if (kids == null) null else kids.get(cp)
    def ensure(cp: Int): Node = {
      if (kids == null) kids = new java.util.HashMap[Integer, Node](4)
      var n = kids.get(cp)
      if (n == null) { n = new Node; kids.put(cp, n) }
      n
    }
  }

  private val root = new Node
  weighted.foreach { case (t, w) =>
    require(t.nonEmpty, "vocab tokens must be non-empty")
    var n = root
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      n = n.ensure(cp)
      i += Character.charCount(cp)
    }
    n.terminal = true
    n.weight = math.max(n.weight, w) // duplicate listings keep the max
  }

  /** UTF-16 length of the longest vocab match at `start`, or the single
    * code point's char count when nothing matches. */
  private def matchLen(word: String, start: Int): Int = {
    var node = root
    var i = start
    var best = -1
    var walking = true
    while (walking && i < word.length) {
      val cp = word.codePointAt(i)
      val nxt = node.child(cp)
      if (nxt == null) walking = false
      else {
        i += Character.charCount(cp)
        if (nxt.terminal) best = i - start
        node = nxt
      }
    }
    if (best > 0) best else Character.charCount(word.codePointAt(start))
  }

  /** Number of greedy tokens in one word; 0 for the empty word (the
    * `split("")` artifact), so empty text budgets as zero tokens. */
  def countWord(word: String): Long = {
    var i = 0
    var n = 0L
    while (i < word.length) {
      i += matchLen(word, i)
      n += 1
    }
    n
  }

  /** Append one word's greedy tokens to `out`, in order. */
  def tokensOf(word: String, out: scala.collection.mutable.ArrayBuffer[AnyRef]): Unit = {
    var i = 0
    while (i < word.length) {
      val len = matchLen(word, i)
      out += UTF8String.fromString(word.substring(i, i + len))
      i += len
    }
  }

  def count(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val m = words.numElements()
    while (i < m) {
      if (!words.isNullAt(i)) total += countWord(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  /** OPTIMAL (minimum-piece) segmentation count of one word — the
    * Viterbi face of [[countWord]]'s greedy longest-match: forward DP
    * over codepoint boundaries, relaxing every trie match starting at
    * each reachable position plus the single-codepoint fallback.
    * Greedy can over-segment (vocab {ab, bcd, a}, word "abcd": greedy
    * ab·c·d = 3, optimal a·bcd = 2); the DP never does, so
    * viterbiCountWord ≤ countWord always (spec-pinned law). O(word
    * length × longest token) like the greedy walk, one int array per
    * word. */
  def viterbiCountWord(word: String): Long = {
    val n = word.length
    if (n == 0) return 0L
    val INF = Int.MaxValue / 2
    val cost = Array.fill(n + 1)(INF)
    cost(0) = 0
    var i = 0
    while (i < n) {
      if (cost(i) < INF) { // skip mid-codepoint (unreachable) positions
        val step = Character.charCount(word.codePointAt(i))
        if (cost(i) + 1 < cost(i + step)) cost(i + step) = cost(i) + 1
        var node = root
        var j = i
        var walking = true
        while (walking && j < n) {
          val cp = word.codePointAt(j)
          val nxt = node.child(cp)
          if (nxt == null) walking = false
          else {
            j += Character.charCount(cp)
            if (nxt.terminal && cost(i) + 1 < cost(j)) cost(j) = cost(i) + 1
            node = nxt
          }
        }
      }
      i += 1
    }
    cost(n).toLong // always reachable through the fallback chain
  }

  def viterbiCount(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val m = words.numElements()
    while (i < m) {
      if (!words.isNullAt(i))
        total += viterbiCountWord(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  def tokens(words: ArrayData): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]
    var i = 0
    val m = words.numElements()
    while (i < m) {
      if (!words.isNullAt(i)) tokensOf(words.getUTF8String(i).toString, out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** WEIGHTED Viterbi segmentation of one word — unigram-LM inference:
    * maximize the summed piece score, ties to the FEWEST pieces (then
    * the solution value is unique; the unweighted [[viterbiCountWord]]
    * is this with all-zero weights). Single-codepoint fallback pieces
    * score 0 and are always available, so every word segments. Returns
    * (pieces, score). */
  def unigramWord(word: String): (Long, Long) = {
    val n = word.length
    if (n == 0) return (0L, 0L)
    val NEG = Long.MinValue / 4
    val sc = Array.fill(n + 1)(NEG)
    val pc = new Array[Long](n + 1)
    sc(0) = 0L
    var i = 0
    while (i < n) {
      if (sc(i) > NEG) {
        def relax(j: Int, w: Long): Unit = {
          val s2 = sc(i) + w
          val p2 = pc(i) + 1
          if (s2 > sc(j) || (s2 == sc(j) && p2 < pc(j))) { sc(j) = s2; pc(j) = p2 }
        }
        relax(i + Character.charCount(word.codePointAt(i)), 0L)
        var node = root
        var j = i
        var walking = true
        while (walking && j < n) {
          val cp = word.codePointAt(j)
          val nxt = node.child(cp)
          if (nxt == null) walking = false
          else {
            j += Character.charCount(cp)
            if (nxt.terminal) relax(j, nxt.weight)
            node = nxt
          }
        }
      }
      i += 1
    }
    (pc(n), sc(n))
  }

  /** Σ over the word array of [[unigramWord]]: (total pieces, total
    * score) as an InternalRow — summing per-word optima is the document
    * optimum because words segment independently. */
  def unigramSegment(words: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    var pieces = 0L
    var score = 0L
    var i = 0
    val m = words.numElements()
    while (i < m) {
      if (!words.isNullAt(i)) {
        val (p, s) = unigramWord(words.getUTF8String(i).toString)
        pieces += p
        score += s
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](pieces, score))
  }
}

object BpeTrie {
  /** All-zero-weight trie (the greedy / min-piece kernels' vocab shape;
    * a constructor overload would erase identically to the weighted
    * one). */
  def unweighted(vocab: Seq[String]): BpeTrie = new BpeTrie(vocab.map(_ -> 0L))
}

/** Total greedy-subword-token count of a word array — the budget metric
  * for packing/chunking/length gating when callers want BPE-faithful
  * budgets instead of [[graft.llm.TextStats.WsRun]] counts. */
case class BpeTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  @transient private lazy val trie = BpeTrie.unweighted(vocab)

  override def prettyName: String = "graft_bpe_token_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.sql}")
  }

  def count(arr: ArrayData): Long = trie.count(arr)

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeTokenCount", this,
      classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {
  def apply(words: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(words), vocab))
}

/** Minimum-piece (Viterbi) subword count of a word array — the optimal
  * segmentation [[BpeTokenCount]]'s greedy walk approximates. The gap
  * between the two IS the tokenizer-inference quality signal: greedy
  * over-segmentation inflates every downstream token budget, and the
  * unigram-LM tokenizer family (SentencePiece) ships Viterbi inference
  * for exactly this reason. Same trie, same codepoint parity, so the DP
  * replays in DuckDB (llm_bpe_viterbi). */
case class ViterbiTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  @transient private lazy val trie = BpeTrie.unweighted(vocab)

  override def prettyName: String = "graft_viterbi_token_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.sql}")
  }

  def count(arr: ArrayData): Long = trie.viterbiCount(arr)

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("viterbiTokenCount", this,
      classOf[ViterbiTokenCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ViterbiTokenCount {
  def apply(words: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(ViterbiTokenCount(ColumnBridge.expression(words), vocab))
}

/** Unigram-LM segmentation of a word array under a WEIGHTED vocab —
  * SentencePiece-style inference: maximize the summed piece score, ties
  * to the fewest pieces. Returns a struct (pieces, score); callers
  * project the fields to plain columns (struct cells never leave an
  * oracle-gated query). Scores are data (fixed-point log-frequencies
  * from training counts in llm_bpe_unigram), so the whole
  * train → score → decode pipeline stays integer-exact and
  * DuckDB-replayable. */
case class UnigramSegment(child: Expression, weighted: Seq[(String, Long)])
    extends UnaryExpression {

  @transient private lazy val trie = new BpeTrie(weighted)

  override def prettyName: String = "graft_unigram_segment"
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.sql}")
  }

  def seg(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow =
    trie.unigramSegment(arr)

  override def nullSafeEval(input: Any): Any =
    seg(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unigramSegment", this,
      classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.seg($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {
  def apply(words: Column, weighted: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramSegment(ColumnBridge.expression(words), weighted))
}

/** The greedy subword tokens themselves, flattened across the word array
  * in order — what [[graft.llm.Packing.packSequences]] slices when it
  * packs BPE-faithful blocks. */
case class BpeTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  @transient private lazy val trie = BpeTrie.unweighted(vocab)

  override def prettyName: String = "graft_bpe_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${t.sql}")
  }

  def tokens(arr: ArrayData): ArrayData = trie.tokens(arr)

  override def nullSafeEval(input: Any): Any =
    tokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeTokens", this,
      classOf[BpeTokens].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.tokens($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokens {
  def apply(words: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(words), vocab))
}
