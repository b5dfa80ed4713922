package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0D, (acc, v) => acc + v) }}}
  *
  * (with optional double casts on x/y) into the native [[DotProduct]]
  * kernel in STRICT mode, which reproduces the HOF null semantics exactly
  * (length mismatch or null element → NULL). Users who write the idiomatic
  * Column expression get codegen'd primitive loops without knowing the
  * kernel exists — the same contract Catalyst's own rewrites follow:
  * observation-equivalent, strictly faster.
  *
  * Injected by [[GraftExtensions]] (boot) or
  * `GraftExtensions.registerRules(spark)` (runtime, via
  * `spark.experimental.extraOptimizations`).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(inner, DoubleType, _, _) => stripCast(inner)
    case other => other
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean =
    (stripCast(e), v) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
      case _ => false
    }

  private def isMulOf(e: Expression, x: NamedExpression, y: NamedExpression): Boolean =
    e match {
      // BOTH operands must already be double-typed (double elements, or
      // float wrapped in an explicit double cast): the kernel multiplies in
      // double, but the HOF idiom over RAW float variables multiplies in
      // FLOAT — rewriting that shape would change low bits of results.
      case Multiply(l, r, _) if l.dataType == DoubleType && r.dataType == DoubleType =>
        (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
      case _ => false
    }

  private def isAddOf(e: Expression, acc: NamedExpression, v: NamedExpression): Boolean =
    e match {
      case Add(l, r, _) =>
        (isVar(l, acc) && isVar(r, v)) || (isVar(l, v) && isVar(r, acc))
      case _ => false
    }

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mul, Seq(x, y), _)),
          Literal(zero, DoubleType),
          LambdaFunction(add, Seq(acc, v), _),
          LambdaFunction(fin, Seq(fv), _))
        if zero == 0.0 && isMulOf(mul, x, y) && isAddOf(add, acc, v) &&
          isVar(fin, fv) && isNumericArray(a) && isNumericArray(b) =>
      DotProduct(a, b, strict = true)
  }
}
