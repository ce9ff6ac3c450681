package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent driver-side replays for the rank/distribution
  * statistics and the deterministic categorical aggregates (r17):
  * the KS distance re-derived from raw per-row values, Mann–Whitney
  * 2U re-derived from EXPLICIT tie-averaged ranks (a different
  * formula than the operator's grid identity — agreement proves the
  * identity), and the mode/listagg tiebreak contracts. The DuckDB
  * gate proves cross-engine agreement; these prove the semantics. */
class RankStatsSpec extends SparkSpec {

  /** (purchase cents, view cents) collected once. */
  private lazy val samples: (Seq[Long], Seq[Long]) = {
    val rows = tables.events
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    (rows.collect { case ("purchase", c) => c },
      rows.collect { case ("view", c) => c })
  }

  test("events_ks_test equals the per-value CDF replay; D bounded") {
    val (a, b) = samples
    val na = a.size.toLong; val nb = b.size.toLong
    val ac = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bc = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val grid = (ac.keySet ++ bc.keySet).toSeq.sorted
    var ca = 0L; var cb = 0L
    var bestD = -1L; var bestAt = Long.MaxValue
    grid.foreach { v =>
      ca += ac.getOrElse(v, 0L); cb += bc.getOrElse(v, 0L)
      val d = math.abs(ca * 1000000L / na - cb * 1000000L / nb)
      if (d > bestD || (d == bestD && v < bestAt)) {
        if (d > bestD) { bestD = d; bestAt = v }
      }
    }
    val r = EventAnalytics.eventsKsTest(tables).head()
    assert((r.getLong(0), r.getLong(1)) == (na, nb))
    assert(r.getLong(2) == bestD,
      s"D mismatch: got ${r.getLong(2)}, replay $bestD")
    assert(r.getLong(3) == bestAt,
      s"argmax mismatch: got ${r.getLong(3)}, replay $bestAt")
    assert(bestD >= 0L && bestD <= 1000000L)
  }

  test("events_mann_whitney 2U equals the EXPLICIT tie-averaged rank " +
      "replay (independent formula), with the U1+U2 identity") {
    val (a, b) = samples
    val na = a.size.toLong; val nb = b.size.toLong
    // explicit ranking: pool, sort, assign each tie group the rank
    // range [lo, hi]; a member's DOUBLED average rank is lo + hi
    val pooled = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    var i = 0
    var r2a = 0L // doubled rank sum of group A
    while (i < pooled.length) {
      var j = i
      while (j < pooled.length && pooled(j)._1 == pooled(i)._1) j += 1
      val lo = i + 1L; val hi = j.toLong // 1-based rank range
      val double = lo + hi
      var k = i
      while (k < j) { if (pooled(k)._2) r2a += double; k += 1 }
      i = j
    }
    val u2 = r2a - na * (na + 1)
    val r = EventAnalytics.eventsMannWhitney(tables).head()
    assert((r.getLong(0), r.getLong(1)) == (na, nb))
    assert(r.getLong(2) == u2, s"2U mismatch: got ${r.getLong(2)}, replay $u2")
    // identity: U1 + U2 = n_a·n_b (doubled: 2U1 + 2U2 = 2 n_a n_b),
    // where 2U2 comes from the mirrored rank sum
    val totalDouble = pooled.length.toLong * (pooled.length + 1)
    val r2b = totalDouble - r2a
    val u2b = r2b - nb * (nb + 1)
    assert(u2 + u2b == 2L * na * nb, "rank-sum identity violated")
    assert(r.getLong(3) == u2 * 1000000L / (na * nb) - 1000000L)
  }

  test("q_mode_per_group picks max count with the smallest-value tiebreak") {
    val rows = tables.orders
      .join(tables.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1))).toIndexedSeq
    val expected = rows.groupBy(_._1).map { case (seg, vs) =>
      val counts = vs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (value, n) = counts.toSeq.minBy { case (v, c) => (-c, v) }
      (seg, value, n)
    }.toSet
    val got = Relational.qModePerGroup(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    // one row per group, total determinism
    assert(got.map(_._1).size == got.size)
  }

  test("q_string_agg emits SORTED lists (the only portable listagg)") {
    val got = Relational.qStringAgg(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty)
    got.foreach { case (region, n, joined) =>
      val parts = joined.split("\\|").toSeq
      assert(parts.size.toLong == n, s"$region: count != list size")
      assert(parts == parts.sorted, s"$region: list not sorted: $joined")
    }
    // spot value: every nation appears exactly once across regions
    val all = got.flatMap(_._3.split("\\|"))
    assert(all.length.toLong == tables.nation.count())
    assert(all.distinct.length == all.length)
  }

  test("events_winsorized_mean equals the order-statistic replay") {
    val rows = tables.events
      .select(col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    val expected = rows.groupBy(_._1).map { case (et, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size.toLong
      // p-th order statistic: smallest v whose 1-based cumulative
      // count reaches ceil(p·n) — i.e. sorted(ceil(p·n) − 1)
      def os(p: Int) = sorted(((n * p + 99) / 100 - 1).toInt)
      val (lo, hi) = (os(5), os(95))
      val winSum = sorted.map(v => math.min(math.max(v, lo), hi)).sum
      (et, (n, lo, hi, winSum * 1000 / n))
    }
    val got = EventAnalytics.eventsWinsorizedMean(tables).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected,
      s"onlyGot=${(got.toSet -- expected.toSet).take(2)} " +
        s"onlyExp=${(expected.toSet -- got.toSet).take(2)}")
    // clamping is real: the winsorized mean sits strictly inside the
    // clamp bounds, and the bounds are genuine data values
    got.foreach { case (et, (n, lo, hi, m)) =>
      assert(lo <= hi && n > 0)
      assert(m >= lo * 1000 && m <= hi * 1000, s"$et: mean outside clamp")
    }
  }

  test("stream_type_entropy == events_type_entropy (pair #37)") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val b = rows(EventAnalytics.eventsTypeEntropy(tables))
    assert(rows(graft.streaming.Streaming.streamTypeEntropy(tables)) == b)
    assert(b.nonEmpty)
  }

  test("events_peak_concurrency equals a driver-side interval sweep, " +
      "and the stream twin matches (pair #40)") {
    val iv = tables.events
      .select(to_date(col("ts")).as("day"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect()
      .map(r => ((r.getDate(0).toString, r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case ((day, u), xs) =>
        (day, u, xs.map(_._2).min, xs.map(_._2).max) }.toSeq
    val expected = iv.groupBy(_._1).map { case (day, vs) =>
      // sweep: at each instant apply all starts, then take the max,
      // then apply ends — closed intervals, starts-before-ends
      val events = vs.flatMap { case (_, _, s, e) =>
        Seq((s, 1), (e, -1)) }
      val byTs = events.groupBy(_._1).toSeq.sortBy(_._1)
      var cur = 0L; var peak = -1L; var at = 0L
      byTs.foreach { case (ts, es) =>
        val starts = es.count(_._2 == 1).toLong
        val ends = es.count(_._2 == -1).toLong
        val conc = cur + starts
        if (conc > peak) { peak = conc; at = ts }
        cur = cur + starts - ends
      }
      assert(cur == 0L, s"$day: sweep did not return to zero")
      day -> (peak, at)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      r.getAs[java.time.LocalDateTime](0).toLocalDate.toString ->
        ((r.getLong(1), r.getLong(2)))
    }.toMap
    val got = rows(EventAnalytics.eventsPeakConcurrency(tables))
    assert(got == expected,
      s"diff=${(got.toSet -- expected.toSet).take(3)}")
    assert(rows(graft.streaming.Streaming.streamPeakConcurrency(tables))
      == expected)
  }

  test("stream_ks_test == events_ks_test (equivalence pair #35)") {
    val b = EventAnalytics.eventsKsTest(tables).head()
    val s = graft.streaming.Streaming.streamKsTest(tables).head()
    assert((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3)) ==
      (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)))
  }
}
