package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Driver-side replays and algebraic identities for the engagement /
  * data-quality additions: streaks, cumulative distinct, growth
  * accounting, the OLS trend, and the Benford audit. Each is
  * re-derived in plain Scala from the raw tables and compared field
  * by field — the DuckDB gate proves cross-engine agreement, these
  * prove the SEMANTICS are the intended ones. */
class EngagementAnalyticsSpec extends SparkSpec {

  /** Distinct (user, epoch-day) activity pairs, driver side. */
  private def activity: Seq[(Long, Long)] = tables.events
    .select(col("user_id"), to_date(col("ts")).as("day"))
    .distinct()
    .collect()
    .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    .toIndexedSeq

  test("q_streaks equals a plain-Scala gaps-and-islands replay") {
    val expected = activity.groupBy(_._1).map { case (u, ds) =>
      val days = ds.map(_._2).sorted
      // split into runs of consecutive days
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (Nil, d) => List(List(d))
        case (h :: t, d) if d == h.head + 1 => (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }.map(r => (r.length.toLong, r.min))
      val (len, start) = runs.maxBy { case (l, s) => (l, -s) }
      (u, days.size.toLong, runs.size.toLong, len, start)
    }.toSet
    val got = Relational.qStreaks(tables).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[java.time.LocalDateTime](4).toLocalDate.toEpochDay)
    }.toSet
    assert(got == expected,
      s"onlyGot=${(got -- expected).take(3)} onlyExp=${(expected -- got).take(3)}")
    assert(got.nonEmpty)
    // non-degenerate at this SF: someone has a streak longer than a day
    assert(got.exists(_._4 > 1), "no multi-day streak in the corpus")
  }

  test("q_cumulative_distinct: prefix sums, monotone, exact total") {
    val rows = Relational.qCumulativeDistinct(tables)
      .orderBy(col("day")).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate.toEpochDay,
        r.getLong(1), r.getLong(2), r.getLong(3)))
    val users = activity.map(_._1).distinct.size.toLong
    assert(rows.last._4 == users, "final cumulative != total distinct users")
    // cum is the running sum of new, and new never exceeds daily active
    rows.foldLeft(0L) { case (acc, (_, daily, nw, cum)) =>
      assert(nw <= daily); assert(cum == acc + nw); cum
    }
    // replay per-day actives and first-seen counts independently
    val daily = activity.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val first = activity.groupBy(_._1).map(_._2.map(_._2).min)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (d, dl, nw, _) =>
      assert(dl == daily(d)); assert(nw == first.getOrElse(d, 0L))
    }
  }

  test("events_growth_accounting: WAU and churn identities hold") {
    // weekly actives computed independently (Monday-start weeks)
    val weekly = tables.events
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val active = weekly.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = EventAnalytics.eventsGrowthAccounting(tables).collect().map {
      r => (r.getAs[java.time.LocalDateTime](0).toLocalDate.toEpochDay,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    assert(got.nonEmpty)
    val byWeek = got.map(r => r._1 -> r).toMap
    got.foreach { case (w, nw, ret, res, chn) =>
      // every weekly active is explained: new + retained + resurrected
      assert(nw + ret + res == active.getOrElse(w, 0L),
        s"week $w: $nw+$ret+$res != active ${active.get(w)}")
      // users active last week either stayed (retained) or churned
      assert(chn == active.getOrElse(w - 7, 0L) - ret,
        s"week $w: churn $chn != active(w-1) ${active.get(w - 7)} - $ret")
    }
    // the first corpus week is all-new; later weeks retain someone
    val firstWeek = active.keys.min
    assert(byWeek(firstWeek)._2 == active(firstWeek))
    assert(got.exists(_._3 > 0), "nobody retained — degenerate corpus")
  }

  test("events_ols_trend equals the closed-form driver fit") {
    val daily = tables.events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val d0 = rows.map(_._2).min
      val xs = rows.map(r => (r._2 - d0).toDouble)
      val ys = rows.map(_._3.toDouble)
      val n = xs.size.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val slope = sxy / sxx
      val icept = my - slope * mx
      val r2 = (sxy * sxy) / (sxx * syy)
      def r4(v: Double) = math.rint((v + 1e-9) * 1e4) / 1e4
      (et, xs.size.toLong, r4(slope), r4(icept), r4(r2))
    }.toSet
    val got = EventAnalytics.eventsOlsTrend(tables).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
    }.toSet
    // closed-form vs Spark's regr_* partials: same math, different
    // summation order — compare after the shared 4-dp rounding with a
    // 1-ulp-at-4dp tolerance
    def close(a: Double, b: Double) = math.abs(a - b) <= 1e-4 + 1e-12
    assert(got.size == expected.size)
    expected.foreach { e =>
      val g = got.find(_._1 == e._1).get
      assert(g._2 == e._2)
      assert(close(g._3, e._3) && close(g._4, e._4) && close(g._5, e._5),
        s"$g vs $e")
    }
    // trend screen is informative: R² varies across types
    assert(got.map(_._5).size > 1)
  }

  test("q_surrogate_keys: dense 1..N in key order, genuinely multi-bucket") {
    val keys = tables.orders.select(col("o_orderkey")).collect()
      .map(_.getLong(0)).sorted
    val want = keys.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    // a small bucket so the sf0.001 key space spans MANY buckets — the
    // offset/local-rank recombination is what's under test (the sf0.01
    // driver gate runs the production default)
    val got = Relational.qSurrogateKeys(tables, bucketSize = 64L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(keys.max / 64L > keys.min / 64L + 1,
      "key space fits two buckets — the two-level path is untested")
  }

  test("events_interval_union equals a driver-side interval merge") {
    val horizon = 300000000L
    val evs = tables.events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("s"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val iv = rows.sortBy(r => (r._2, r._3)).map(r => (r._2, r._2 + horizon))
      val merged = iv.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, (s, e)) => List((s, e))
        case ((ms, me) :: t, (s, e)) =>
          if (s <= me) (ms, math.max(me, e)) :: t else (s, e) :: (ms, me) :: t
      }
      val lens = merged.map { case (s, e) => e - s }
      (u, merged.size.toLong, lens.sum, lens.max)
    }.toSet
    val got = EventAnalytics.eventsIntervalUnion(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"onlyGot=${(got -- expected).take(3)} onlyExp=${(expected -- got).take(3)}")
    // non-degenerate: merging actually happened somewhere
    assert(got.exists(_._3 > horizon), "no interval ever merged")
  }

  test("events_mad_outliers equals a driver-side quantized replay " +
      "and resists the whale that breaks z-scores") {
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      val m = if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
      math.rint((m + 1e-9) * 1e4) / 1e4 // the shared 4-dp quantization
    }
    val vals = tables.events.select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val expected = vals.groupBy(_._1).map { case (et, rows) =>
      val xs = rows.map(_._2).toSeq
      val m = med(xs)
      val devs = xs.map(v => math.abs(v - m))
      val mad = med(devs)
      (et, xs.size.toLong, m, mad, devs.count(_ > 3.0 * mad).toLong)
    }.toSet
    val got = EventAnalytics.eventsMadOutliers(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got == expected,
      s"onlyGot=${(got -- expected).take(3)} onlyExp=${(expected -- got).take(3)}")
    // robustness: injecting one whale leaves median/MAD (and thus the
    // outlier threshold) unchanged while the naive 3σ rule collapses
    val (et0, xs0) = vals.groupBy(_._1).head match {
      case (k, rows) => (k, rows.map(_._2).toSeq)
    }
    val whale = xs0 :+ 1e9
    val mBefore = med(xs0); val mAfter = med(whale)
    assert(math.abs(mAfter - mBefore) < 1.0, "median moved by the whale")
    val mean = whale.sum / whale.size
    val sd = math.sqrt(whale.map(v => (v - mean) * (v - mean)).sum / whale.size)
    val zOut = whale.count(v => math.abs(v - mean) > 3 * sd)
    val madW = med(whale.map(v => math.abs(v - mAfter)))
    val madOut = whale.count(v => math.abs(v - mAfter) > 3 * madW)
    assert(madOut > zOut, s"MAD ($madOut) should flag more than 3σ ($zOut)")
    assert(et0.nonEmpty)
  }

  test("q_time_weighted_avg equals an integer driver replay and " +
      "diverges from the arithmetic mean") {
    val evs = tables.events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val s = rows.sortBy(r => (r._3, r._2))
      val gaps = s.zip(s.drop(1)).map { case (a, b) =>
        (a._4, (b._3 - a._3) / 1000000L) }
      val span = gaps.map(_._2).sum
      if (gaps.isEmpty || span <= 0) None
      else Some((u, gaps.size.toLong, span,
        gaps.map { case (c, g) => c * g }.sum / span))
    }.toSet
    val got = EventAnalytics.qTimeWeightedAvg(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"onlyGot=${(got -- expected).take(3)} onlyExp=${(expected -- got).take(3)}")
    assert(got.nonEmpty)
    // the weighting must matter: somewhere TWAP differs from the plain
    // mean by more than rounding
    val means = evs.groupBy(_._1).view
      .mapValues(rs => rs.map(_._4).sum / rs.size).toMap
    assert(got.exists { case (u, _, _, tw) =>
      math.abs(tw - means(u)) > 1 }, "TWAP never diverged from the mean")
  }

  test("events_bounce_rate: session accounting identities") {
    val rows = EventAnalytics.eventsBounceRate(tables).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // bounces never exceed sessions; ppm is the exact integer ratio
    rows.foreach { case (_, s, b, ppm) =>
      assert(b <= s); assert(ppm == b * 1000000L / s)
    }
    // total sessions across days == the sessionizer's session count
    val totalSessions = Relational.qSessionize(tables).count()
    assert(rows.map(_._2).sum == totalSessions,
      s"${rows.map(_._2).sum} != $totalSessions")
    // non-degenerate: the corpus has bounces somewhere
    assert(rows.map(_._3).sum > 0, "no single-event session at this SF")
  }

  test("q_benford_audit: exact masses, full coverage, fixed table") {
    val rows = Relational.qBenfordAudit(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq == (1 to 9),
      "every leading digit must appear at this SF")
    // no row of lineitem is dropped: cents >= 1 always
    assert(rows.map(_._2).sum == tables.lineitem.count())
    // the expected-mass table is the fixed Benford ppm list (sums 1e6)
    val exp = rows.map(r => r._1 -> r._4).toMap
    Relational.benfordPpm.foreach { case (d, p) => assert(exp(d) == p) }
    assert(rows.map(_._4).sum == 1000000L)
    val total = rows.map(_._2).sum
    rows.foreach { case (_, n, obs, e, dev) =>
      assert(obs == n * 1000000L / total)
      assert(dev == obs - e)
    }
  }
}
