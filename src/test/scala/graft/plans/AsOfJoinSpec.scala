package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational

class AsOfJoinSpec extends SparkSpec {

  test("native as-of join equals the window-based rewrite exactly") {
    val t = tables
    val native = Relational.qAsofJoinNative(t)
    val window = Relational.qAsofJoin(t)
    assert(native.count() == t.events.count(), "left-outer: one row per event")
    val diff = native.exceptAll(window).count() + window.exceptAll(native).count()
    assert(diff == 0, s"native and window as-of disagree on $diff rows")
  }

  test("physical plan uses AsOfJoinExec with one shuffle per side") {
    val df = Relational.qAsofJoinNative(tables)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan) // nodeName renders without the Exec suffix
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("unmatched left rows carry nulls (left-outer semantics)") {
    import spark.implicits._
    val l = Seq((1L, 100L), (2L, 50L)).toDF("k", "t")
    val r = Seq((1L, 90L, "a"), (1L, 95L, "b"), (2L, 60L, "late")).toDF("rk", "rt", "v")
    val out = AsOfJoinOps.asofJoin(l, r, "k", "t", "rk", "rt")
      .select("k", "t", "v").collect().map(x => (x.getLong(0), x.isNullAt(2), if (x.isNullAt(2)) null else x.getString(2))).toSet
    // k=1: last right with rt<=100 is "b"; k=2: right rt=60 > 50 → null
    assert(out == Set((1L, false, "b"), (2L, true, null)), out.toString)
  }

  test("equal timestamps match (inclusive as-of)") {
    import spark.implicits._
    val l = Seq((7L, 100L)).toDF("k", "t")
    val r = Seq((7L, 100L, "x")).toDF("rk", "rt", "v")
    val out = AsOfJoinOps.asofJoin(l, r, "k", "t", "rk", "rt").select("v").head()
    assert(out.getString(0) == "x")
  }
}
