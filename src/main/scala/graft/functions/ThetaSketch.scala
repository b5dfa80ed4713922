package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregate — the SET-ALGEBRA member of the mergeable
  * sketch tier. HLL answers only |A∪B|; theta sketches (Dasgupta et
  * al., the DataSketches KMV family bundled with Spark but not exposed
  * in SQL) additionally support INTERSECTION and DIFFERENCE over the
  * same per-group partials — "how many documents do CC dumps A and B
  * share, and how many are new in B" is one groupBy pass + driver-side
  * set algebra over kilobyte sketches, where the exact answer is a
  * corpus-wide pair join per source pair.
  *
  * Determinism/exactness contract: below 2^lgK retained entries a
  * theta sketch is EXACT (theta = 1, every distinct hash retained), so
  * intersections/differences of exact sketches return exact counts —
  * the oracle-gated face pins VALUES and `require`s exact mode rather
  * than asserting a probabilistic band (above the threshold the
  * estimate carries the published ~1/√(2^lgK) RSE; deployments size
  * lgK to the cardinality they audit). Hashing is the library default
  * seed — deterministic across runs and engines' replays.
  *
  * Empty keys: DataSketches `update("")`/`update(Array.empty)` is a
  * SILENT no-op (RejectedNullOrEmpty), which would make exact-mode
  * counts diverge from `COUNT(DISTINCT)` on corpora containing ''.
  * Empty inputs therefore map to a fixed sentinel byte pair
  * `0xC0 0x80` — an overlong encoding no valid UTF-8 string can
  * produce, so string-keyed counts match COUNT(DISTINCT) exactly; for
  * BINARY keys a literal two-byte [0xC0,0x80] input would collide with
  * '' (documented, vanishingly unlikely, and impossible for text). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4,26], got $lgK")

  override def prettyName: String = "graft_theta_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private def builder = SetOperation.builder().setLogNominalEntries(lgK)

  override def createAggregationBuffer(): Union = builder.buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    // update(String) hashes the UTF-8 bytes, so routing strings through
    // update(byte[]) is hash-identical — and lets '' take the sentinel
    // path instead of the library's silent RejectedNullOrEmpty no-op
    child.eval(input) match {
      case null                 => ()
      case s: UTF8String        => buf.update(ThetaSketchAgg.nonEmpty(s.getBytes))
      case l: java.lang.Long    => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case b: Array[Byte]       => buf.update(ThetaSketchAgg.nonEmpty(b))
      case other => throw new IllegalStateException(
        s"theta sketch input must be string/integral/binary, got $other " +
          s"(${child.dataType})")
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult)
    a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = builder.buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

object ThetaSketchAgg {
  /** Sentinel standing in for the empty key — invalid UTF-8 (overlong
    * NUL), unreachable from any real string's encoded bytes. */
  private[functions] val EmptySentinel: Array[Byte] =
    Array(0xC0.toByte, 0x80.toByte)

  private[functions] def nonEmpty(b: Array[Byte]): Array[Byte] =
    if (b.isEmpty) EmptySentinel else b
}

/** Column entry point + the driver-side set-algebra toolkit (the
  * cms_merge/quantile_merge discipline: bounded partials collect, the
  * algebra runs on kilobyte compacts, raw data never moves twice). */
object ThetaSketch {

  def agg(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())

  def fromBytes(bytes: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  def union(a: Sketch, b: Sketch, lgK: Int = 12): CompactSketch =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion().union(a, b)

  def intersect(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildIntersection().intersect(a, b)

  def aNotB(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)

  /** Rounded estimate — exact when `!s.isEstimationMode`. */
  def estimateLong(s: Sketch): Long = math.round(s.getEstimate)
}
