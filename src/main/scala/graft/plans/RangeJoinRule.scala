package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naturally-written interval theta-join
  *
  *   l JOIN r ON l.k = r.k AND r.t > l.t AND r.t <= l.t + W
  *
  * (timestamps as epoch-micros longs) into the window-bucketed
  * equi-join [[RangeJoin]] implements by hand:
  *
  *   explode l into time cells {t div W, t div W + 1}
  *   JOIN r bucketed to {t div W} ON (k, cell) — plus the original
  *   range predicates as a post-filter.
  *
  * Without this, Spark plans the range predicate as a per-key post-join
  * filter: fine when the equi-keys are selective, quadratic when a key
  * has many rows. The rewrite bounds per-pair work to genuinely
  * near-in-time rows, the difference between a usable and an unusable
  * plan at 100 TB. Same idea as the range-join optimizations in the big
  * commercial Spark runtimes, expressed as a standard injected
  * `Rule[LogicalPlan]`.
  *
  * Deliberately conservative: INNER joins only; the two range predicates
  * must bound r.t from both sides off the SAME left column with a
  * foldable positive window; all three columns must be LongType
  * (epoch-micros convention — see `unix_micros`). Anything else is left
  * to Spark's own planner.
  */
class RangeJoinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      rewrite(j, left, right, cond, hint).getOrElse(j)
  }

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.subsetOf(side.outputSet)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression,
                      hint: JoinHint): Option[LogicalPlan] = {
    // injected optimizer rules run in a fixed-point batch, and the
    // rewritten join still carries the range predicates — the cell
    // columns mark it as already rewritten so the rule is idempotent
    if (left.output.exists(_.name == "_graft_lcell") ||
        right.output.exists(_.name == "_graft_rcell")) return None
    val conjuncts = splitConjuncts(cond)

    // classify: equi-preds, strict lower bound r.t > l.t, upper bound
    // r.t <= l.t + W
    var equi = List.empty[(Expression, Expression)] // (leftExpr, rightExpr)
    var lower: Option[(AttributeReference, AttributeReference)] = None
    var upper: Option[(AttributeReference, AttributeReference, Long)] = None
    var rest = List.empty[Expression]

    conjuncts.foreach {
      case EqualTo(a, b) if fromSide(a, left) && fromSide(b, right) =>
        equi ::= (a, b)
      case EqualTo(a, b) if fromSide(b, left) && fromSide(a, right) =>
        equi ::= (b, a)
      case GreaterThan(rt: AttributeReference, lt: AttributeReference)
          if rt.dataType == LongType && fromSide(rt, right) && fromSide(lt, left) =>
        lower = Some((rt, lt))
      case LessThan(lt: AttributeReference, rt: AttributeReference)
          if rt.dataType == LongType && fromSide(rt, right) && fromSide(lt, left) =>
        lower = Some((rt, lt))
      case LessThanOrEqual(rt: AttributeReference, Add(lt: AttributeReference, w, _))
          if rt.dataType == LongType && fromSide(rt, right) &&
            fromSide(lt, left) && windowOf(w).isDefined =>
        upper = Some((rt, lt, windowOf(w).get))
      case GreaterThanOrEqual(Add(lt: AttributeReference, w, _), rt: AttributeReference)
          if rt.dataType == LongType && fromSide(rt, right) &&
            fromSide(lt, left) && windowOf(w).isDefined =>
        upper = Some((rt, lt, windowOf(w).get))
      case other => rest ::= other
    }

    (lower, upper) match {
      case (Some((rt, lt1)), Some((rt2, lt2, w)))
          if rt.semanticEquals(rt2) && lt1.semanticEquals(lt2) &&
            w > 0 && equi.nonEmpty && rest.isEmpty =>
        Some(buildBucketed(j, left, right, equi, lt1, rt, w, hint))
      case _ => None
    }
  }

  /** The window width, only when it is a foldable NON-NULL positive
    * long — a null literal must not NPE inside the optimizer (a thrown
    * rule would fail every query in the session). */
  private def windowOf(w: Expression): Option[Long] =
    if (w.foldable && w.dataType == LongType)
      w.eval() match {
        case l: java.lang.Long if l > 0 => Some(l)
        case _ => None
      }
    else None

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def buildBucketed(j: Join, left: LogicalPlan, right: LogicalPlan,
                            equi: List[(Expression, Expression)],
                            lt: AttributeReference, rt: AttributeReference,
                            w: Long, hint: JoinHint): LogicalPlan = {
    val wLit = Literal(w, LongType)
    val cell = IntegralDivide(lt, wLit)
    // left side: explode into its own cell and the next one
    val lCellAttr = AttributeReference("_graft_lcell", LongType, nullable = true)()
    val gen = Generate(
      Explode(CreateArray(Seq(cell, Add(cell, Literal(1L, LongType))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(lCellAttr), child = left)
    // right side: its single cell
    val rCellAlias = Alias(IntegralDivide(rt, wLit), "_graft_rcell")()
    val proj = Project(right.output :+ rCellAlias, right)

    val equiCond = equi.map { case (le, re) => EqualTo(le, re): Expression }
    val newCond = (equiCond :+
      EqualTo(lCellAttr, rCellAlias.toAttribute) :+
      GreaterThan(rt, lt) :+
      LessThanOrEqual(rt, Add(lt, wLit))).reduce(And)

    val newJoin = Join(gen, proj, Inner, Some(newCond), hint)
    // restore the original output (drop the helper cell columns)
    Project(j.output, newJoin)
  }
}
