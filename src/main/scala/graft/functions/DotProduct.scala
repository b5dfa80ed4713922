package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over `array<float>` / `array<double>` columns.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — runs
  * through Spark's interpreted higher-order-function machinery and
  * materializes the zipped array per row; on the similarity hot path
  * (corpus-sized scans × 64-dim vectors) that interpretation is the
  * dominant cost. This expression is the one custom Catalyst kernel the
  * bench justified (SURVEY §4.2 escape hatch): a tight primitive loop with
  * `doGenCode`, no intermediate allocation, whole-stage-codegen friendly.
  *
  * Semantics: Σ a(i)·b(i) accumulated left-to-right in double —
  * bit-identical to the HOF formulation it replaces. Two null modes:
  *  - lenient (default, the library surface): common-prefix length, null
  *    elements contribute 0 — never poisons a score;
  *  - strict (`strict = true`, used by [[RewriteDotProduct]]): result is
  *    NULL when lengths differ or any element is null — the exact
  *    semantics of `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so the
  *    optimizer rewrite is observation-equivalent.
  */
case class DotProduct(left: Expression, right: Expression,
                      strict: Boolean = false) extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable || strict

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  @inline private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    if (strict && a.numElements() != b.numElements()) return null
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) {
        if (strict) return null
      } else s += get(a, ta, i) * get(b, tb, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullElem =
        if (strict) s"${ev.isNull} = true; $s = 0.0; break;"
        else "continue;"
      val lenCheck =
        if (strict) s"if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; } else"
        else ""
      s"""
         |double $s = 0.0;
         |$lenCheck {
         |  int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $nullElem }
         |    $s += ${getter(a, elemType(left).get, i)} * ${getter(b, elemType(right).get, i)};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector kernels. */
object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL `div` — exact integral division. The engine-independent building
    * block for round-half-up ratio arithmetic (`(20000a+b) div 2b`),
    * replacing floating division whose 4dp rounding can disagree across
    * engines at .00005 boundaries. */
  def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
