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

  test("forward as-of equals the union+window rewrite exactly") {
    // independent implementation: union events (kind 0) and orders
    // (kind 1) so an order AT the event's timestamp falls inside the
    // [current, following] frame, then first(ignoreNulls) forward
    val t = tables
    val native = Relational.qAsofJoinForward(t).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) null else r.get(4))).toSet
    import org.apache.spark.sql.expressions.Window
    val p = t.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("next_purchase_id"))
      .select(col("user_id"), col("ts").as("ats"), lit(1).as("kind"),
        lit(null).cast("long").as("event_id"),
        struct(col("next_purchase_id"),
          col("ts").as("next_purchase_ts")).as("ord"))
    val ev = t.events.select(col("user_id"), col("ts").as("ats"),
      lit(0).as("kind"), col("event_id"),
      lit(null).cast("struct<next_purchase_id:bigint,next_purchase_ts:timestamp_ntz>")
        .as("ord"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(asc("ats"), asc("kind"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rewrite = p.unionAll(ev)
      .withColumn("nxt", first(col("ord"), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(col("event_id"),
        col("nxt.next_purchase_id").as("next_purchase_id"),
        col("nxt.next_purchase_ts").as("next_purchase_ts"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.get(2))).toSet
    assert(native == rewrite,
      s"forward drift: ${(native -- rewrite).take(3)} vs ${(rewrite -- native).take(3)}")
    // both directions must differ somewhere, or forward is dead code
    assert(native.exists(_._2 >= 0) && native.exists(_._2 < 0),
      "forward matches are all-hit or all-miss — vacuous")
  }

  test("q_asof_nearest equals a naive per-event scan with backward ties") {
    val t = tables
    val purchases = t.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("pid"))
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val events = t.events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = events.map { case (eid, u, us) =>
      val ps = purchases.getOrElse(u, Array.empty[(Long, Long, Long)])
      val prev = ps.filter(_._2 <= us).sortBy(_._2).lastOption
      val next = ps.filter(_._2 >= us).sortBy(_._2).headOption
      (prev, next) match {
        case (None, None) => (eid, -1L, -1L, "none")
        case (Some(p), None) => (eid, p._3, us - p._2, "prev")
        case (None, Some(n)) => (eid, n._3, n._2 - us, "next")
        case (Some(p), Some(n)) =>
          if (us - p._2 <= n._2 - us) (eid, p._3, us - p._2, "prev")
          else (eid, n._3, n._2 - us, "next")
      }
    }.toSet
    val got = Relational.qAsofJoinNearest(t).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) "none" else r.getString(5))).toSet
    assert(got == expect,
      s"nearest drift: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // both directions must win somewhere
    assert(expect.exists(_._4 == "prev") && expect.exists(_._4 == "next"))
  }

  test("q_asof_tolerance equals a naive scan and the staleness bound bites") {
    val t = tables
    val tolUs = 3L * 86400000000L
    val purchases = t.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("pid"))
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val events = t.events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = events.map { case (eid, u, us) =>
      val prev = purchases.getOrElse(u, Array.empty[(Long, Long, Long)])
        .filter(_._2 <= us).sortBy(_._2).lastOption
      prev match {
        case Some(p) if us - p._2 <= tolUs => (eid, p._3)
        case _ => (eid, -1L) // no purchase, or stale past the bound
      }
    }.toSet
    val got = Relational.qAsofJoinTolerance(t).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == expect,
      s"tolerance drift: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // the bound must NULL some matches backward as-of would serve, and
    // keep others — otherwise the operator degenerates either way
    val backward = events.count { case (_, u, us) =>
      purchases.getOrElse(u, Array.empty[(Long, Long, Long)]).exists(_._2 <= us) }
    val kept = expect.count(_._2 >= 0)
    assert(kept > 0 && kept < backward, s"kept=$kept backward=$backward")
  }

  test("forward as-of: exact-timestamp match is inclusive and peeking preserves later lefts") {
    import spark.implicits._
    val l = Seq((7L, 100L), (7L, 100L), (7L, 150L)).toDF("k", "t")
    val r = Seq((7L, 100L, "x"), (7L, 200L, "y")).toDF("rk", "rt", "v")
    val out = AsOfJoinOps.asofJoin(l, r, "k", "t", "rk", "rt", forward = true)
      .select("t", "v").collect().map(x => (x.getLong(0), x.getString(1))).toList.sorted
    // both t=100 lefts peek the SAME right row (the cursor must not
    // consume it); t=150 advances to the next one
    assert(out == List((100L, "x"), (100L, "x"), (150L, "y")), out.toString)
  }
}
