package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite interval-OVERLAP joins into grid equi-joins
  * (SURVEY.md §2, E161).
  *
  * An inner join whose only cross-side condition is the overlap pattern
  * `a.s <= b.e AND b.s <= a.e` has no equi-key, so Spark can only plan
  * it as a nested-loop/cartesian — O(|A|·|B|) comparisons, the shape
  * that dies first at scale. The standard fix (`q_interval_overlap`
  * applies it by hand; this rule applies it to ANY matching query,
  * including plain SQL) is the GRID rewrite: explode each row to the
  * `span/w + 1` grid cells its interval touches and let the cells be
  * the equi-join key, so candidates are bounded by cell co-residency
  * instead of the full cross product.
  *
  * EXACTNESS (no distinct pass needed): every qualifying pair is
  * counted exactly once by keeping only the cell that holds
  * `greatest(ls, rs)` (the two left-hand sides of the ≤ conjuncts).
  * Proof sketch — with per-side cell emission over
  * [min(s,e), max(s,e)] and g = greatest(ls, rs):
  * g ≥ ls ≥ left-min, and if g = rs > ls then the overlap conjunct
  * rs ≤ le bounds g by left-max — so div(g) lies inside the left
  * side's emitted range; symmetrically for the right (ls ≤ re).
  * Integral division is monotone, so the argument survives the
  * truncating `DIV` for negative values too, and the least/greatest
  * normalization makes the rewrite exact even for inverted (s > e)
  * intervals. NULL bounds: `sequence(NULL, …)` explodes to zero rows,
  * exactly matching the original join's NULL-comparison drop.
  *
  * Scope guards: inner joins only, DETERMINISTIC integral-typed
  * bounds, no existing cross-side equi conjunct (if one exists the
  * join already has a shuffle key and the rewrite is not the win —
  * and the guard doubles as the idempotence check, since the rewrite
  * itself installs an equi conjunct on the grid cell). Extra
  * conjuncts are preserved as join-condition residue. Cell width via
  * `graft.intervalJoin.bucketWidth` (size it to the span
  * distribution; ANY width is correct), kill switch via
  * `graft.intervalJoin.enabled`.
  */
object IntervalOverlapRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BktName = "__graft_ivl_bkt"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.intervalJoin.enabled", "true").toBoolean) {
      return plan
    }
    val width = conf.getConfString("graft.intervalJoin.bucketWidth", "4096").toLong
    require(width > 0, s"graft.intervalJoin.bucketWidth must be positive, got $width")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) if noCrossEqui(j, cond) =>
        findOverlap(j, cond) match {
          case Some((ls, le, rs, re)) =>
            rewrite(j, ls, le, rs, re, width)
          case None => j
        }
    }
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }

  private def sidesOf(j: Join, e: Expression): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(j.left.outputSet)) Some(true)
    else if (refs.subsetOf(j.right.outputSet)) Some(false)
    else None
  }

  /** No conjunct already equi-joins the two sides (also makes the rule
    * idempotent: the rewrite adds a grid-cell equality). */
  private def noCrossEqui(j: Join, cond: Expression): Boolean =
    !splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (sidesOf(j, a), sidesOf(j, b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (sidesOf(j, a), sidesOf(j, b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }

  /** Find `ls <= re AND rs <= le` (in any orientation/order): returns
    * (ls, le, rs, re) with ls/le from the left side, rs/re right. */
  private def findOverlap(j: Join,
      cond: Expression): Option[(Expression, Expression, Expression, Expression)] = {
    // normalize every ≤/≥ conjunct to (leftSideExpr, rightSideExpr)
    // meaning leftSideExpr <= rightSideExpr with the plan sides known
    val lr = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    val rl = scala.collection.mutable.ArrayBuffer.empty[(Expression, Expression)]
    splitConjunctivePredicates(cond).foreach { c =>
      val norm = c match {
        case LessThanOrEqual(a, b) => Some((a, b))
        case GreaterThanOrEqual(a, b) => Some((b, a))
        case _ => None
      }
      norm.foreach { case (lo, hi) =>
        if (lo.deterministic && hi.deterministic &&
            integral(lo) && integral(hi)) {
          (sidesOf(j, lo), sidesOf(j, hi)) match {
            case (Some(true), Some(false)) => lr += ((lo, hi))
            case (Some(false), Some(true)) => rl += ((lo, hi))
            case _ =>
          }
        }
      }
    }
    // one conjunct each way: ls <= re (lr) and rs <= le (rl)
    (lr.headOption, rl.headOption) match {
      case (Some((ls, re)), Some((rs, le))) => Some((ls, le, rs, re))
      case _ => None
    }
  }

  private def longDiv(e: Expression, w: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(w))

  private def cells(child: LogicalPlan, s: Expression, e: Expression,
      w: Long): (LogicalPlan, Attribute) = {
    val sL = Cast(s, LongType)
    val eL = Cast(e, LongType)
    val lo = IntegralDivide(Least(Seq(sL, eL)), Literal(w))
    val hi = IntegralDivide(Greatest(Seq(sL, eL)), Literal(w))
    val bkt = AttributeReference(BktName, LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved and the optimizer's plan validation rejects us
    val seq = new Sequence(lo, hi, Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val gen = Generate(Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bkt), child = child)
    (gen, bkt)
  }

  private def rewrite(j: Join, ls: Expression, le: Expression,
      rs: Expression, re: Expression, w: Long): LogicalPlan = {
    val (leftGen, lBkt) = cells(j.left, ls, le, w)
    val (rightGen, rBkt) = cells(j.right, rs, re, w)
    val dedup = EqualTo(lBkt,
      longDiv(Greatest(Seq(Cast(ls, LongType), Cast(rs, LongType))), w))
    val newCond = And(j.condition.get, And(EqualTo(lBkt, rBkt), dedup))
    Project(j.output, Join(leftGen, rightGen, Inner, Some(newCond), j.hint))
  }
}
