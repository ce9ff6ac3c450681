package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge

/** Native as-of join (SURVEY.md §2.2 R21, scale path): for every left
  * row, attach the LAST right row with the same key and time ≤ the
  * left time (left-outer semantics).
  *
  * This is the full custom-operator stack — a [[AsOfJoin]] logical
  * node, [[AsOfJoinStrategy]] planner strategy, and a sort-merge
  * [[AsOfJoinExec]] physical operator — for a join shape Spark's
  * built-ins can't express without a union+window rewrite or a range
  * self-join. Cost model: ONE hash shuffle of each side on the key,
  * in-partition sort on (key, time), then a single linear merge pass
  * per partition with O(1) carried state. No row explosion at any
  * skew, any scale.
  *
  * v1 constraint: keys and times must be long-backed fixed-width types
  * (bigint / timestamp / timestamp_ntz) — the fast path for the tables
  * this engine targets.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key: one shuffle each, then merge
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // in-partition sort on (key, time): the merge below is one linear pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(Seq(lkOrd, ltOrd, rkOrd, rtOrd).forall(_ >= 0), "unresolved as-of columns")
    val rightArity = right.output.length

    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      // emit UnsafeRows: every downstream consumer (exchange, agg,
      // codegen stage) needs them, and one generated projection here
      // beats a per-operator interpreted conversion of the JoinedRow
      val toUnsafe = UnsafeProjection.create(output, output)
      new Iterator[InternalRow] {
        private var rNext: InternalRow = advanceRight()
        private var best: InternalRow = null // last right row for best's key
        private var bestKey: Long = 0L
        // single reusable buffer for the carried right row: the sort
        // iterator reuses its UnsafeRow, so the candidate must be
        // copied before advancing — but into ONE buffer (copyFrom
        // reuses the backing array), not a fresh allocation per
        // consumed right row as row.copy() would be
        private val bestBuf = new UnsafeRow(rightArity)
        bestBuf.pointTo(new Array[Byte](64), 64) // copyFrom needs a byte[]-backed target; it grows on demand

        private def retainBest(r: InternalRow): InternalRow = r match {
          case u: UnsafeRow => bestBuf.copyFrom(u); bestBuf
          case other => other.copy()
        }

        private def advanceRight(): InternalRow =
          if (rit.hasNext) rit.next() else null

        override def hasNext: Boolean = lit.hasNext

        override def next(): InternalRow = {
          val l = lit.next()
          if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) {
            toUnsafe(joined(l, nullRight))
          } else {
            val lk = l.getLong(lkOrd)
            val lt = l.getLong(ltOrd)
            if (forward) {
              // FORWARD: the match is the FIRST right row with the same
              // key and time >= left time — advance past everything
              // strictly behind, then PEEK rNext without consuming it
              // (the next left row may need the same right row)
              var advancing = true
              while (advancing && rNext != null) {
                if (rNext.isNullAt(rkOrd) || rNext.isNullAt(rtOrd)) {
                  rNext = advanceRight() // null keys/times never match
                } else {
                  val rk = rNext.getLong(rkOrd)
                  if (rk < lk || (rk == lk && rNext.getLong(rtOrd) < lt)) {
                    rNext = advanceRight()
                  } else {
                    advancing = false
                  }
                }
              }
              val hit = rNext != null && rNext.getLong(rkOrd) == lk
              toUnsafe(joined(l, if (hit) rNext else nullRight))
            } else {
            if (best != null && bestKey != lk) best = null
            var advancing = true
            while (advancing && rNext != null) {
              if (rNext.isNullAt(rkOrd) || rNext.isNullAt(rtOrd)) {
                rNext = advanceRight() // null keys/times never match
              } else {
                val rk = rNext.getLong(rkOrd)
                if (rk < lk || (rk == lk && rNext.getLong(rtOrd) <= lt)) {
                  if (rk == lk) {
                    best = retainBest(rNext) // retained across iterator steps
                    bestKey = rk
                  }
                  rNext = advanceRight()
                } else {
                  advancing = false
                }
              }
            }
            toUnsafe(joined(l, if (best != null && bestKey == lk) best else nullRight))
            }
          }
        }
      }
    }
  }
}

/** Public DataFrame API for the native as-of join. */
object AsOfJoinOps {
  /** `left` as-of `right`: every left row gains the columns of the
    * last right row with `rightKey == leftKey` and
    * `rightTime <= leftTime` (nulls when none). Requires the planner
    * strategy from [[graft.GraftExtensions]].
    */
  def asofJoin(
      leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      forward: Boolean = false): DataFrame = {
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    PlanBridge.ofRows(leftDf.sparkSession,
      AsOfJoin(
        leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
        attr(leftDf, leftKey), attr(leftDf, leftTime),
        attr(rightDf, rightKey), attr(rightDf, rightTime), forward))
  }
}
