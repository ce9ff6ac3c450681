package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The interval-overlap grid rewrite (E161): a plain non-equi overlap
  * join must come out as a grid EQUI-join — bit-identical results to
  * the nested-loop plan it replaces, on adversarial intervals too.
  */
class IntervalOverlapRewriteSpec extends SparkSpec {

  // adversarial interval mix: negatives (truncating-DIV territory),
  // inverted s > e, NULL bounds, spans crossing many grid cells
  private def sides(): (DataFrame, DataFrame) = {
    import spark.implicits._
    val l = Seq[(Long, java.lang.Long, java.lang.Long)](
      (1L, 0L, 100L), (2L, -5000L, -4000L), (3L, 900L, 200L), // inverted
      (4L, null, 50L), (5L, 7000L, 7000L), (6L, -100L, 8000L),
      (7L, 4095L, 4097L) // straddles the default 4096 cell edge
    ).toDF("lid", "ls", "le")
    val r = Seq[(Long, java.lang.Long, java.lang.Long)](
      (10L, 50L, 60L), (11L, -4500L, -4200L), (12L, 250L, 800L), // inverted-overlap target
      (13L, 40L, null), (14L, 6999L, 7001L), (15L, 100000L, 100001L),
      (16L, 4096L, 4096L)
    ).toDF("rid", "rs", "re")
    (l, r)
  }

  private def overlapJoin(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select(col("lid"), col("rid"))

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("overlap join rewrites to a grid equi-join and matches the nested-loop result") {
    val (l, r) = sides()
    val withRule = overlapJoin(l, r)
    val p = finalPlan(withRule)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"rule did not fire — still a nested loop:\n$p")
    val got = withRule.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    spark.conf.set("graft.intervalJoin.enabled", "false")
    try {
      val off = overlapJoin(l, r)
      val expect = off.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val pOff = finalPlan(off)
      assert(pOff.contains("CartesianProduct") || pOff.contains("BroadcastNestedLoop"),
        s"control run should be the nested loop:\n$pOff")
      assert(got == expect,
        s"rewrite drift: extra=${(got -- expect).take(5)} missing=${(expect -- got).take(5)}")
      // the adversarial corners must actually participate
      assert(expect.exists(_._1 == 2L), "negative-interval pair missing from truth")
      assert(expect.exists(p2 => p2._1 == 7L && p2._2 == 16L),
        "cell-edge pair missing from truth")
      assert(!expect.exists(p2 => p2._1 == 4L || p2._2 == 13L),
        "NULL-bounded rows must never match")
    } finally spark.conf.set("graft.intervalJoin.enabled", "true")
  }

  test("the rewrite also fires on plain SQL") {
    val (l, r) = sides()
    l.createOrReplaceTempView("ivl_l")
    r.createOrReplaceTempView("ivl_r")
    val df = spark.sql(
      "SELECT lid, rid FROM ivl_l JOIN ivl_r ON ls <= re AND rs <= le")
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(df.count() > 0)
  }

  test("joins that already have a cross-side equi key are left untouched") {
    import spark.implicits._
    val l = Seq((1L, 0L, 100L), (2L, 10L, 20L)).toDF("k", "ls", "le")
    val r = Seq((1L, 50L, 60L), (2L, 500L, 600L)).toDF("k2", "rs", "re")
    val df = l.join(r, col("k") === col("k2") &&
      col("ls") <= col("re") && col("rs") <= col("le"))
    val p = finalPlan(df)
    assert(!p.contains("__graft_ivl_bkt"), s"rule fired on an equi join:\n$p")
    assert(df.count() == 1)
  }
}
