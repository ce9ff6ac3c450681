package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards for the event-analytics fan-out hazards. */
class EventAnalyticsSpec extends SparkSpec {

  test("events_cuped matches an independent driver-side re-derivation") {
    // recompute the whole CUPED chain from raw events in plain Scala
    // (cents quantization, per-user pre/post sums, md5 variant,
    // integer moments, θ and adjusted diff) and compare every output
    // field — the operator's arithmetic is pinned end to end, not
    // just shape-checked
    val split = 15
    val rows = tables.events.select(col("user_id"),
        datediff(col("ts").cast("date"),
          lit(java.sql.Date.valueOf("2024-01-01"))).as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1).map { case (u, es) =>
      val x = es.filter(_._2 < split).map(_._3).sum
      val y = es.filter(_._2 >= split).map(_._3).sum
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val isA = String.format("%02x", Byte.box(md5(0))).charAt(0) < '8'
      (u, x, y, isA)
    }.toSeq
    val n = byUser.size
    def big(l: Long) = BigInt(l)
    val (sx, sy) = (byUser.map(_._2).sum, byUser.map(_._3).sum)
    val sxy = byUser.map(r => big(r._2) * big(r._3)).sum
    val sxx = byUser.map(r => big(r._2) * big(r._2)).sum
    val syy = byUser.map(r => big(r._3) * big(r._3)).sum
    val cov = (big(n) * sxy - big(sx) * big(sy)).toDouble
    val varX = (big(n) * sxx - big(sx) * big(sx)).toDouble
    val varY = (big(n) * syy - big(sy) * big(sy)).toDouble
    val a = byUser.filter(_._4); val b = byUser.filterNot(_._4)
    def mean(s: Long, c: Int) = s.toDouble / c / 100.0
    val theta = cov / varX
    val diffRaw = mean(b.map(_._3).sum, b.size) - mean(a.map(_._3).sum, a.size)
    val diffCuped = diffRaw -
      theta * (mean(b.map(_._2).sum, b.size) - mean(a.map(_._2).sum, a.size))
    def rnd(v: Double) = math.rint((v + 1e-9) * 1e4) / 1e4
    val out = EventAnalytics.eventsCuped(tables).collect().head
    assert(out.getLong(0) == n && out.getLong(1) == a.size && out.getLong(2) == b.size)
    assert(out.getDouble(3) == rnd(theta), s"theta ${out.getDouble(3)} != ${rnd(theta)}")
    assert(out.getDouble(4) == rnd(diffRaw), s"diff_raw ${out.getDouble(4)} != ${rnd(diffRaw)}")
    assert(out.getDouble(5) == rnd(diffCuped), s"diff_cuped ${out.getDouble(5)} != ${rnd(diffCuped)}")
    assert(out.getDouble(6) == rnd(cov * cov / (varX * varY)), "var_reduction mismatch")
  }

  test("events_pagerank matches an independent integer re-derivation") {
    // replay the integer-unit iteration in plain Scala from the same
    // capped item sets: symmetric distinct edges, r0 = 1e6, three
    // rounds of 150000 + (17·Σ(r div deg)) div 20 — every node's
    // final micro-rank must match exactly (the whole point of the
    // integer formulation: NO float drift anywhere to tolerate)
    val items = EventAnalytics.cappedUserItems(tables, 64)
      .collect().toList.map(r => (r.getLong(0), r.getInt(1)))
    val edges = items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a != b) yield (a, b)
    }.toSet
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = edges.toSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = in.map { case (n, s) => n -> (150000L + (17L * s) / 20L) }
    }
    val got = EventAnalytics.eventsPagerank(tables).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(got == r, s"pagerank mismatch: ${(got.toSet -- r.toSet).take(3)} vs ${(r.toSet -- got.toSet).take(3)}")
    // the graph is non-trivial and ranks differentiate
    assert(got.size > 5 && got.values.toSet.size > 1)
  }

  test("cooccur cap bounds per-user pair fan-out") {
    val cap = 3
    val items = EventAnalytics.cappedUserItems(tables, cap)
    val maxPerUser = items.groupBy(col("user_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxPerUser <= cap,
      s"cap $cap leaked: a user kept $maxPerUser items")
    // the self-join therefore emits ≤ cap·(cap−1)/2 pairs per user
    val pairsPerUser = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.user_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(pairsPerUser <= cap.toLong * (cap - 1) / 2)
  }

  test("cooccur cap is exact below the threshold") {
    // every sf0.001 user holds far fewer distinct items than the
    // default cap, so the capped result must equal the uncapped one
    val capped = EventAnalytics.eventsRecommendCooccur(tables)
    val uncapped = EventAnalytics.eventsRecommendCooccur(tables,
      maxItemsPerUser = Int.MaxValue)
    assert(capped.exceptAll(uncapped).isEmpty &&
      uncapped.exceptAll(capped).isEmpty)
  }
}
