package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Shared interpreted/codegen kernel for [[TopDotIndices]]: indices of
  * the `k` matrix rows with the largest dot products against the input
  * vector, ordered (dot desc, index asc) — ties resolve to the LOWEST
  * index, so a cid-ascending codebook keeps the deterministic
  * lowest-centroid-id contract. Bounded selection (one pass, O(m·k)
  * worst case with k tiny by contract), no allocation beyond the result. */
object TopDotKernel {
  def compute(arr: ArrayData, matrix: Array[Array[Double]], k: Int,
              isFloat: Boolean): ArrayData = {
    val m = matrix.length
    val keep = math.min(k, m)
    val topIdx = new Array[Int](keep)
    val topDot = new Array[Double](keep)
    var filled = 0
    var r = 0
    while (r < m) {
      val p = matrix(r)
      val n = math.min(arr.numElements(), p.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i))
          s += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * p(i)
        i += 1
      }
      // insertion position: strictly-greater wins; equal keeps earlier row
      var pos = filled
      while (pos > 0 && s > topDot(pos - 1)) pos -= 1
      if (pos < keep) {
        val last = math.min(filled, keep - 1)
        var q = last
        while (q > pos) { topIdx(q) = topIdx(q - 1); topDot(q) = topDot(q - 1); q -= 1 }
        topIdx(pos) = r
        topDot(pos) = s
        if (filled < keep) filled += 1
      }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topIdx, filled))
  }
}

/** Top-k matrix-row indices by dot product, as ONE codegen'd expression.
  *
  * The IVF path previously scored centroids with `graft_dot` inside a
  * `transform(...)` higher-order function — HOF lambda bodies run on the
  * INTERPRETED expression path, so every row paid `|codebook|` boxed,
  * interpreted dot products plus an intermediate struct array, then an
  * `array_sort`/`array_max` over it. This kernel does the same scoring
  * in primitive loops with a bounded top-k selection and no intermediate
  * array — the assign stage stays a narrow whole-stage-codegen
  * projection at any codebook size up to the [[graft.llm.Similarity]]
  * 65,536-centroid cap.
  */
case class TopDotIndices(child: Expression, matrix: Array[Array[Double]],
                         k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")
  require(matrix.nonEmpty, "matrix must be non-empty")

  override def prettyName: String = "graft_top_dot_indices"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TopDotKernel.compute(input.asInstanceOf[ArrayData], matrix, k,
      elemType.contains(FloatType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val isFloat = elemType.contains(FloatType)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TopDotKernel.compute($a, $mat, $k, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopDotIndices {
  def apply(vec: Column, matrix: Array[Array[Double]], k: Int): Column =
    ColumnBridge.column(TopDotIndices(
      ColumnBridge.expression(vec), matrix, k))
}
