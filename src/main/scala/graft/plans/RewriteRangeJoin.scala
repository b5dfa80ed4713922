package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType, LongType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: plan a banded timestamp range join as a bucketized
  * HASH join instead of a nested loop.
  *
  * A user writing the natural predicate
  *
  * {{{ probe.join(build, $"b_ts" > $"ts" && $"b_ts" <= $"ts" + expr("INTERVAL 1 HOUR")) }}}
  *
  * gets a BroadcastNestedLoopJoin from vanilla Spark — O(n·m) work, the
  * join that kills a 100 TB pipeline. This rule detects the band shape
  * `b ∈ (a, a+W]` (any strict/inclusive variant, either argument order,
  * constant width W) between opposite join sides and rewrites it to the
  * same bucketized form `op_join_range` builds by hand: the `a` side gets
  * bucket `⌊µs(a)/W⌋`, the `b` side explodes into `{⌊µs(b)/W⌋, ⌊µs(b)/W⌋−1}`
  * (truncating division is monotone, so an interval of width W spans at
  * most two buckets — the pair is exhaustive), and the ORIGINAL predicate
  * is kept as the residual, so the rewrite is observation-equivalent by
  * construction: it can only REMOVE pairs the residual would reject
  * anyway.
  *
  * Fires only on: INNER joins (either orientation) and LEFT OUTER joins
  * whose probe side is the left (the preserved side must not be the
  * exploded one, or unmatched rows would duplicate), TIMESTAMP
  * attributes on opposite sides, a constant non-negative width, and NO
  * existing cross-side equality conjunct (if one exists Spark already
  * plans a hash join — and the guard makes the rule idempotent under
  * fixed-point batches, since the rewrite itself introduces such a
  * conjunct).
  *
  * Injected by [[graft.functions.GraftExtensions]].
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(inner, TimestampType, _, _) => stripCast(inner)
    case other => other
  }

  /** Interval width in microseconds; months are variable-length → reject. */
  private def widthMicros(lit: Literal): Option[Long] = lit match {
    case Literal(v: Long, _: DayTimeIntervalType) => Some(v)
    case Literal(ci: CalendarInterval, CalendarIntervalType) if ci.months == 0 =>
      Some(ci.days * 86400000000L + ci.microseconds)
    case _ => None
  }

  /** `b > a` / `b >= a` (either written order) on timestamp attributes. */
  private def asLower(c: Expression): Option[(Expression, Expression)] = {
    def ts(e: Expression) = e.dataType == TimestampType
    c match {
      case GreaterThan(b, a) if ts(a) && ts(b)        => Some((a, b))
      case GreaterThanOrEqual(b, a) if ts(a) && ts(b) => Some((a, b))
      case LessThan(a, b) if ts(a) && ts(b)           => Some((a, b))
      case LessThanOrEqual(a, b) if ts(a) && ts(b)    => Some((a, b))
      case _ => None
    }
  }

  /** `b <= a + W` / `b < a + W` (either written order) → (a, b, W). */
  private def asUpper(c: Expression): Option[(Expression, Expression, Long)] = {
    def tsAdd(e: Expression): Option[(Expression, Long)] = stripCast(e) match {
      case TimestampAddInterval(a, l: Literal, _) => widthMicros(l).map(a -> _)
      case _ => None
    }
    c match {
      case LessThanOrEqual(b, e)    => tsAdd(e).map { case (a, w) => (a, b, w) }
      case LessThan(b, e)           => tsAdd(e).map { case (a, w) => (a, b, w) }
      case GreaterThanOrEqual(e, b) => tsAdd(e).map { case (a, w) => (a, b, w) }
      case GreaterThan(e, b)        => tsAdd(e).map { case (a, w) => (a, b, w) }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, joinType @ (Inner | LeftOuter), Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def oneSide(e: Expression): Boolean =
        e.references.nonEmpty &&
          (e.references.subsetOf(left.outputSet) || e.references.subsetOf(right.outputSet))
      def oppositeSides(a: Expression, b: Expression): Boolean =
        oneSide(a) && oneSide(b) &&
          (a.references.subsetOf(left.outputSet) != b.references.subsetOf(left.outputSet))
      val hasCrossEquality = conjuncts.exists {
        case EqualTo(l, r) => oppositeSides(l, r)
        case EqualNullSafe(l, r) => oppositeSides(l, r)
        case _ => false
      }
      val band =
        if (hasCrossEquality) None
        else {
          val lowers = conjuncts.flatMap(asLower)
          val uppers = conjuncts.flatMap(asUpper)
          (for {
            (la, lb) <- lowers
            (ua, ub, w) <- uppers
            if w >= 0 && la.semanticEquals(ua) && lb.semanticEquals(ub) &&
              oppositeSides(la, lb)
          } yield (la, lb, w)).headOption
        }
      band match {
        // LeftOuter preserves left rows exactly once, so the left side must
        // be the PROBE (single bucket); an exploded left would duplicate
        // unmatched rows. aOnLeft ⇒ probe = left, so that is the condition.
        case Some((a, b, w))
            if joinType == Inner || a.references.subsetOf(left.outputSet) =>
          val wLit = Literal(math.max(w, 1L), LongType) // W=0 → width-1 buckets
          def bucket(e: Expression): Expression = IntegralDivide(UnixMicros(e), wLit)
          val aOnLeft = a.references.subsetOf(left.outputSet)
          val (probe, build) = if (aOnLeft) (left, right) else (right, left)
          val probeAlias = Alias(bucket(a), "__graft_rjb")()
          val newProbe = Project(probe.output :+ probeAlias, probe)
          val buildBucket = bucket(b)
          val genOut = AttributeReference("__graft_rjb_gen", LongType, nullable = true)()
          val gen = Generate(
            Explode(CreateArray(Seq(buildBucket, Subtract(buildBucket, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genOut), child = build)
          val bucketEq = EqualTo(probeAlias.toAttribute, genOut)
          val (newLeft, newRight) = if (aOnLeft) (newProbe, gen) else (gen, newProbe)
          Project(j.output, Join(newLeft, newRight, joinType, Some(And(bucketEq, cond)), hint))
        case _ => j
      }
  }
}
