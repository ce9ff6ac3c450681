package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite absolute-difference BAND joins into banded
  * equi-joins (SURVEY.md §2, E213 — the `er_review_queue` size-band
  * scheme promoted to an automatic Catalyst rule, the sibling of
  * [[IntervalOverlapRewrite]]).
  *
  * An inner join whose only cross-side condition is
  * `abs(a.x - b.y) <= c` has no equi-key, so Spark plans a nested
  * loop — O(|A|·|B|), the first casualty of scale. The standard fix
  * (applied by hand in `er_review_queue`'s size bands and every
  * banded similarity join) is BANDING: bucket both sides by
  * `x DIV c`; any pair within `c` has bucket ids that differ by at
  * most 1, so probing each right row's three adjacent buckets with an
  * EQUI-join finds every qualifying pair, and the original predicate
  * stays as the residual that removes band false-positives.
  *
  * EXACTNESS (no distinct pass needed): the left side emits its ONE
  * bucket id and only the right side explodes to {k−1, k, k+1}, which
  * are three DISTINCT values — a (left, right) pair can therefore
  * match on at most one band row, so multiplicity is preserved
  * exactly. Completeness holds under the TRUNCATING `DIV` (not just
  * floor): integral division by `c` is monotone and moves by at most
  * 1 across any interval of width `c` — the diff-2 case needs the
  * bucket ids to span two full steps, i.e. |x−y| > c (checked for the
  * negative/zero-straddling truncation cases, which only ever WIDEN
  * the zero bucket and never add a step). NULL operands: the left
  * band is NULL (equality never matches — as the original predicate),
  * and the right `sequence(NULL, …)` explodes to zero rows, dropping
  * a row that could never match anything.
  *
  * Scope guards (shared discipline with the interval rule): inner
  * joins only; DETERMINISTIC integral operands, one from each side;
  * literal band `c ≥ 1` (strict `<` is normalized to `≤ c−1` first —
  * exact for integers); no existing cross-side equi conjunct (then
  * the join already has a shuffle key, and the guard doubles as the
  * idempotence check since the rewrite installs one). Kill switch:
  * `graft.absBandJoin.enabled`.
  */
object AbsBandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BandName = "__graft_abs_band"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("graft.absBandJoin.enabled", "true").toBoolean) {
      return plan
    }
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if noCrossEqui(j, cond) =>
        findAbsBand(j, cond) match {
          case Some((lx, ry, band)) => rewrite(j, lx, ry, band)
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

  /** Find `abs(x − y) ≤ c` (any orientation; `<` normalized to
    * `≤ c−1`): returns (leftSideExpr, rightSideExpr, band). */
  private def findAbsBand(j: Join,
      cond: Expression): Option[(Expression, Expression, Long)] = {
    def bandOf(c: Expression, strict: Boolean): Option[Long] =
      if (c.foldable && integral(c)) {
        val v: Option[Long] = c.eval() match {
          case i: java.lang.Integer => Some(i.longValue)
          case l: java.lang.Long => Some(l)
          case s: java.lang.Short => Some(s.longValue)
          case _ => None
        }
        v.map(x => if (strict) x - 1 else x).filter(_ >= 1)
      } else None
    splitConjunctivePredicates(cond).view.flatMap { p =>
      val m: Option[(Expression, Long)] = p match {
        case LessThanOrEqual(Abs(d, _), c) => bandOf(c, strict = false).map((d, _))
        case GreaterThanOrEqual(c, Abs(d, _)) => bandOf(c, strict = false).map((d, _))
        case LessThan(Abs(d, _), c) => bandOf(c, strict = true).map((d, _))
        case GreaterThan(c, Abs(d, _)) => bandOf(c, strict = true).map((d, _))
        case _ => None
      }
      m.flatMap {
        case (Subtract(x, y, _), band)
            if x.deterministic && y.deterministic &&
              integral(x) && integral(y) =>
          (sidesOf(j, x), sidesOf(j, y)) match {
            case (Some(true), Some(false)) => Some((x, y, band))
            case (Some(false), Some(true)) => Some((y, x, band))
            case _ => None
          }
        case _ => None
      }
    }.headOption
  }

  private def bandDiv(e: Expression, band: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(band))

  private def rewrite(j: Join, lx: Expression, ry: Expression,
      band: Long): LogicalPlan = {
    val lAlias = Alias(bandDiv(lx, band), BandName)()
    val leftProj = Project(j.left.output :+ lAlias, j.left)
    val rBkt = AttributeReference(BandName, LongType, nullable = false)()
    val rDiv = bandDiv(ry, band)
    // Sequence is TimeZoneAwareExpression (see IntervalOverlapRewrite)
    val seq = new Sequence(
      Subtract(rDiv, Literal(1L)), Add(rDiv, Literal(1L)),
      Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
    val rightGen = Generate(Explode(seq),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(rBkt), child = j.right)
    val newCond = And(j.condition.get, EqualTo(lAlias.toAttribute, rBkt))
    Project(j.output, Join(leftProj, rightGen, Inner, Some(newCond), j.hint))
  }
}
