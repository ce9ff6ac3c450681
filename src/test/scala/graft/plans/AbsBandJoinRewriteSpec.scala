package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The abs-difference band rewrite (E213): a plain non-equi
  * `abs(a.x − b.y) <= c` join must come out as a banded EQUI-join —
  * bit-identical results (including multiplicity) to the nested-loop
  * plan it replaces, on adversarial values too.
  */
class AbsBandJoinRewriteSpec extends SparkSpec {

  // adversarial mix: negatives (truncating-DIV territory), values
  // straddling zero, exact-band-edge distances, NULLs, duplicates
  // (multiplicity must survive the rewrite)
  private def sides(): (DataFrame, DataFrame) = {
    import spark.implicits._
    val l = Seq[(Long, java.lang.Long)](
      (1L, 0L), (2L, -5L), (3L, 100L), (4L, null), (5L, 3L),
      (6L, 3L), // duplicate value: two distinct rows must both match
      (7L, -3L)
    ).toDF("lid", "lx")
    val r = Seq[(Long, java.lang.Long)](
      (10L, 3L), (11L, -2L), (12L, 103L), (13L, null), (14L, 0L),
      (15L, 97L), (16L, -8L)
    ).toDF("rid", "ry")
    (l, r)
  }

  private def bandJoin(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, abs(col("lx") - col("ry")) <= 3)
      .select(col("lid"), col("rid"))

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("abs band join rewrites to an equi-join and matches the nested loop") {
    val (l, r) = sides()
    val withRule = bandJoin(l, r)
    val p = finalPlan(withRule)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"rule did not fire — still a nested loop:\n$p")
    val got = withRule.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
      .sorted
    spark.conf.set("graft.absBandJoin.enabled", "false")
    try {
      val off = bandJoin(l, r)
      val pOff = finalPlan(off)
      assert(pOff.contains("CartesianProduct") || pOff.contains("BroadcastNestedLoop"),
        s"control run should be the nested loop:\n$pOff")
      val expect = off.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
        .sorted
      // SEQ compare, not Set: band false-positive dedup errors or the
      // 3-bucket explode double-matching a pair would show here
      assert(got == expect,
        s"rewrite drift: got=$got expect=$expect")
      // the adversarial corners must participate in the truth
      assert(expect.contains((2L, 16L)), "negative-pair missing") // -5 vs -8
      assert(expect.contains((7L, 14L)), "zero-straddling pair missing") // -3 vs 0
      assert(expect.contains((1L, 10L)), "exact-band-edge pair missing") // 0 vs 3
      assert(expect.contains((5L, 14L)) && expect.contains((6L, 14L)),
        "duplicate left rows must BOTH match")
      assert(!expect.exists(p2 => p2._1 == 4L || p2._2 == 13L),
        "NULL operands must never match")
    } finally spark.conf.set("graft.absBandJoin.enabled", "true")
  }

  test("strict < is normalized to <= c-1 exactly") {
    import spark.implicits._
    val l = Seq((1L, 0L), (2L, 10L)).toDF("lid", "lx")
    val r = Seq((10L, 3L), (11L, 13L), (12L, 2L)).toDF("rid", "ry")
    val df = l.join(r, abs(col("lx") - col("ry")) < 3)
      .select(col("lid"), col("rid"))
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // |0-3| = 3 is NOT < 3; |0-2| = 2 is
    assert(got == Set((1L, 12L)), got)
  }

  test("the rewrite also fires on plain SQL") {
    val (l, r) = sides()
    l.createOrReplaceTempView("ab_l")
    r.createOrReplaceTempView("ab_r")
    val df = spark.sql(
      "SELECT lid, rid FROM ab_l JOIN ab_r ON abs(lx - ry) <= 3")
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(df.count() > 0)
  }

  test("joins that already have a cross-side equi key are left untouched") {
    import spark.implicits._
    val l = Seq((1L, 0L), (2L, 10L)).toDF("k", "lx")
    val r = Seq((1L, 2L), (2L, 500L)).toDF("k2", "ry")
    val df = l.join(r, col("k") === col("k2") &&
      abs(col("lx") - col("ry")) <= 3)
    val p = finalPlan(df)
    // the equi key already drives a hash join; no band explode
    assert(!p.contains("Generate"), s"rule fired needlessly:\n$p")
    assert(df.count() == 1)
  }

  test("band c = 0 and non-literal bounds are out of scope (no rewrite)") {
    import spark.implicits._
    val l = Seq((1L, 5L, 2L)).toDF("lid", "lx", "lc")
    val r = Seq((10L, 5L)).toDF("rid", "ry")
    val zero = l.join(r, abs(col("lx") - col("ry")) <= 0)
    assert(zero.count() == 1) // still correct, whatever the plan
    val nonLit = l.join(r, abs(col("lx") - col("ry")) <= col("lc"))
    val p = finalPlan(nonLit)
    assert(!p.contains("Generate"), s"non-literal band must not rewrite:\n$p")
    assert(nonLit.count() == 1)
  }
}
