package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Mergeable quantile sketch emitted as BYTES — the percentile member
  * of the engine's mergeable-sketch tier (HLL for cardinality, CMS for
  * frequency, this for rank). The structure is Greenwald–Khanna
  * summaries (`QuantileSummaries`, the same machinery inside Spark's
  * `approx_percentile`), but where `approx_percentile` evaluates
  * straight to values, this aggregate SERIALIZES the summary — so
  * per-group partials (per-day, per-shard) can be stored at ingest and
  * UNIONED at query time, the pre-aggregation pattern percentile
  * dashboards need at 100 TB where `percentile_disc` is an exact
  * global sort per query.
  *
  * Contract (Greenwald–Khanna, deterministic): a merged summary's
  * `query(q)` returns a value whose exact rank lies within
  * `±relativeError·N` of `q·N`. Merge is commutative up to that bound —
  * the VALUES may differ by merge order, the bound never fails, which
  * is why the oracle-gated face (`agg_quantile_merge`) gates the rank
  * window, not the bytes (the agg_approx/agg_hll_merge discipline).
  *
  * Buffers cross the partial/final exchange via Java serialization of
  * the compressed summary (a bounded `sampled` array — size
  * O(1/relativeError·log(eps·N)), never data-sized). Null inputs are
  * skipped; an empty group yields an empty (count 0) sketch.
  */
case class QuantileSketchAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries]
  with UnaryLike[Expression] {

  require(relativeError > 0 && relativeError < 1,
    s"relativeError must be in (0,1), got $relativeError")

  override def prettyName: String = "graft_quantile_sketch"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(buf: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    // the Column wrapper casts to double; numeric widening here keeps a
    // hand-built instance safe too (ImplicitCastInputTypes is
    // private[sql], so the analyzer can't be asked to coerce)
    child.eval(input) match {
      case null                  => buf
      case d: java.lang.Double   => buf.insert(d)
      case n: java.lang.Number   => buf.insert(n.doubleValue())
      case other => throw new IllegalStateException(
        s"quantile sketch input must be numeric, got $other (${child.dataType})")
    }
  }

  override def merge(a: QuantileSummaries,
                     b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  override def eval(buf: QuantileSummaries): Any =
    serialize(buf.compress())

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileSketch.toBytes(buf.compress())

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): QuantileSketchAgg =
    copy(child = c)
}

/** Column-level entry points plus the driver-side partial toolkit
  * (deserialize → merge → query), mirroring how `agg_cms_merge`
  * consumes `CountMinSketch.readFrom`. */
object QuantileSketch {

  /** Aggregate `c` (cast to double) into a serialized mergeable
    * quantile summary. */
  def agg(c: Column, relativeError: Double = 0.01): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(c.cast("double")), relativeError)
        .toAggregateExpression())

  def toBytes(qs: QuantileSummaries): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    try oos.writeObject(qs) finally oos.close()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[QuantileSummaries] finally ois.close()
  }

  /** Union two serialized-or-deserialized partials. */
  def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  /** Rank query on a (merged) summary; None on an empty sketch. */
  def query(qs: QuantileSummaries, q: Double): Option[Double] =
    qs.compress().query(q)
}
