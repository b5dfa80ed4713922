package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]], as a narrow codegen'd
  * kernel — the prefilter that makes big-set decontamination scale: a
  * bloom over millions of benchmark shingles is a few MB (~1.2 B/item at
  * 1 % FPP) where the broadcast string set is hundreds (dozens of bytes
  * per shingle), and the probe runs inside whole-stage codegen over the
  * exploded 100 TB shingle stream, dropping ≥ 99 % of it before any
  * exchange. One-sided error only: `false` is definite (safe to drop),
  * `true` needs the exact verify join downstream.
  *
  * The filter travels as its serialized bytes (the sketch's own
  * `writeTo` wire format) and deserializes lazily once per executor —
  * the expression tree stays small and version-stable. Probes use
  * `mightContainBinary` on the UTF8 bytes, the same bytes
  * `stat.bloomFilter`'s builder put for a string column. */
case class BloomMightContainStr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from generated code too — keeps deserialization lazy and
    * once-per-executor on BOTH eval paths. */
  def probe(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression (bytes ride once in the case-class field)
    // rather than the deserialized BloomFilter: referencing the live
    // filter shipped the multi-MB sketch TWICE per plan (references array
    // + field) and forced an eager driver-side deserialize
    val self = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainStr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.probe($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainStr {
  def apply(text: Column, bloom: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    ColumnBridge.column(BloomMightContainStr(ColumnBridge.expression(text), bos.toByteArray))
  }
}
