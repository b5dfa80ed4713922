package graft.functions

import java.io.{ByteArrayInputStream, ObjectInputStream}
import java.nio.{ByteBuffer, ByteOrder}

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
  * Buffers cross the partial/final exchange — and land in storage —
  * as an EXPLICIT versioned little-endian layout (format byte `1`,
  * relativeError, compressThreshold, count, entry count, then
  * (value, g, delta) triples of the compressed `sampled` array — size
  * O(1/relativeError·log(eps·N)), never data-sized). Stored-at-ingest
  * partials are the component's whole point, so the bytes must outlive
  * any one Spark build: the layout names only GK-paper quantities, is
  * pinned by a golden-bytes spec, and `fromBytes` still accepts the
  * pre-r16 Java-serialization stream (magic 0xACED) for migration.
  * Null inputs are skipped; an empty group yields a count-0 sketch.
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

  /** Current explicit format version. Header byte values never collide
    * with the legacy Java-serialization stream (which begins 0xAC). */
  val FormatV1: Byte = 1

  /** Explicit v1 layout, little-endian throughout:
    * {{{
    *   [0]      format byte = 1
    *   [1..8]   relativeError : Double
    *   [9..12]  compressThreshold : Int
    *   [13..20] count : Long            (total inserted values)
    *   [21..24] n : Int                 (sampled entries)
    *   then n × { value: Double, g: Long, delta: Long }   (24 bytes each)
    * }}}
    * Every field is a quantity from the Greenwald–Khanna paper plus the
    * two construction parameters — nothing references a JVM class, so
    * the bytes survive any Spark upgrade. Caller must pass a COMPRESSED
    * summary (both call sites do); we compress defensively anyway.
    */
  def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = if (qs0.compressed) qs0 else qs0.compress()
    val n = qs.sampled.length
    val buf = ByteBuffer.allocate(25 + 24 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(FormatV1)
    buf.putDouble(qs.relativeError)
    buf.putInt(qs.compressThreshold)
    buf.putLong(qs.count)
    buf.putInt(n)
    var i = 0
    while (i < n) {
      val s = qs.sampled(i)
      buf.putDouble(s.value); buf.putLong(s.g); buf.putLong(s.delta)
      i += 1
    }
    buf.array()
  }

  /** Legacy-stream class whitelist: the exact object graph a
    * Java-serialized [[QuantileSummaries]] reaches — the summary, its
    * Stats entries, the Scala collection/runtime plumbing those
    * serialize through, and arrays thereof. Gadget chains live in
    * java.util/JDK/third-party classes, all outside this set. */
  private def requireLegacyClassAllowed(name0: String): Unit = {
    val name = name0.dropWhile(_ == '[') match { // unwrap array dims
      case n if n.startsWith("L") && n.endsWith(";") =>
        n.substring(1, n.length - 1)
      case n => n // primitive array code ("D", "J", …) or plain class
    }
    val ok = name.length <= 1 || // primitive array element
      name.startsWith("org.apache.spark.sql.catalyst.util.QuantileSummaries") ||
      name.startsWith("scala.collection.") ||
      name.startsWith("scala.runtime.") ||
      name == "scala.math.Ordering" || name.startsWith("scala.math.Ordering$")
    if (!ok) throw new java.io.InvalidClassException(name0,
      "class not allowed in a legacy quantile-sketch stream " +
        "(deserialization is whitelisted to QuantileSummaries/Stats " +
        "and Scala collection plumbing)")
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    require(bytes.length >= 2, s"quantile sketch blob too short: ${bytes.length} bytes")
    bytes(0) match {
      case FormatV1 => fromBytesV1(bytes)
      // pre-r16 partials were Java-serialized QuantileSummaries; the
      // stream magic is 0xAC 0xED — read-only migration path. The
      // stream is deserialized under a resolveClass WHITELIST: stored
      // partials can come from an external store, and an unrestricted
      // ObjectInputStream is a deserialization gadget surface — only
      // the summary's own classes (and the Scala collection plumbing
      // inside them) may load; anything else throws before any
      // readObject side effect runs.
      case m if (m & 0xFF) == 0xAC && (bytes(1) & 0xFF) == 0xED =>
        val ois = new ObjectInputStream(new ByteArrayInputStream(bytes)) {
          override def resolveClass(desc: java.io.ObjectStreamClass): Class[_] = {
            requireLegacyClassAllowed(desc.getName)
            super.resolveClass(desc)
          }
        }
        try ois.readObject().asInstanceOf[QuantileSummaries] finally ois.close()
      case m => throw new IllegalArgumentException(
        s"unknown quantile sketch format byte: $m")
    }
  }

  private def fromBytesV1(bytes: Array[Byte]): QuantileSummaries = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.get() // format byte, already checked
    val relativeError = buf.getDouble
    val compressThreshold = buf.getInt
    val count = buf.getLong
    val n = buf.getInt
    require(bytes.length == 25 + 24L * n,
      s"quantile sketch v1 blob length ${bytes.length} != ${25 + 24L * n} for $n entries")
    val sampled = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      sampled(i) = QuantileSummaries.Stats(buf.getDouble, buf.getLong, buf.getLong)
      i += 1
    }
    new QuantileSummaries(compressThreshold, relativeError, sampled, count, true)
  }

  /** Union two serialized-or-deserialized partials. */
  def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  /** Rank query on a (merged) summary; None on an empty sketch. */
  def query(qs: QuantileSummaries, q: Double): Option[Double] =
    qs.compress().query(q)
}
