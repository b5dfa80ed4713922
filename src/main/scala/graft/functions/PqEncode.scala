package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization encoder (Jégou et al. 2011): split a vector into
  * `numSub` contiguous subspaces and replace each slice with the index of
  * its nearest codebook centroid (squared L2, ties to the LOWEST code —
  * total and deterministic). A 64-dim float vector (256 B) becomes
  * `numSub` small ints (8 B at 8×256 codebooks) — the 30×+ compression
  * that makes billion-vector ANN indexes fit in memory; asymmetric
  * distance search then works from per-subspace lookup tables against
  * these codes.
  *
  * THE CODEBOOKS ARE DATA (the planted-model discipline): a
  * `[subspace][centroid][dim]` table carried by the expression
  * (`addReferenceObj` — compiled once per plan, no join, no shuffle), so
  * encoding is one narrow codegen'd projection and — with planted
  * codebooks — replayable in ANSI SQL. Train real codebooks per
  * subspace with [[graft.llm.Similarity.trainCodebook]].
  *
  * Defect vectors (wrong dim count, null/NaN elements) encode to NULL
  * rather than a silently-wrong code — run
  * [[graft.llm.Audit.embeddingReport]] first; its defect classes are
  * exactly what maps to NULL here. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty, "need at least one subspace codebook")
  require(codebooks.forall(_.nonEmpty), "every subspace needs >= 1 centroid")
  require(codebooks.head.head.nonEmpty, "centroids need >= 1 dimension")
  require(
    codebooks.forall(_.forall(_.size == codebooks.head.head.size)),
    "all centroids must share one subspace dimensionality")

  private val numSub = codebooks.size
  private val subDim = codebooks.head.head.size

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  def encode(vec: ArrayData): ArrayData = {
    if (vec.numElements() != numSub * subDim) return null
    val v = new Array[Double](numSub * subDim)
    var i = 0
    while (i < v.length) {
      if (vec.isNullAt(i)) return null
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      if (java.lang.Double.isNaN(x)) return null
      v(i) = x
      i += 1
    }
    val codes = new Array[Int](numSub)
    var s = 0
    while (s < numSub) {
      val base = s * subDim
      val ks = cb(s)
      var bestD = Double.PositiveInfinity
      var bestK = 0
      var k = 0
      while (k < ks.length) {
        val c = ks(k)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = v(base + j) - c(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestK = k }
        k += 1
      }
      codes(s) = bestK
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.encode($a);
       |if (${ev.value} == null) ${ev.isNull} = true;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))
}
