package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Driver replays for the time-series densification and abuse-screen
  * operators.
  */
class TimeSeriesSpec extends SparkSpec {

  private def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_gap_fill equals a driver-side spine + ffill/bfill/interp replay") {
    val base = tables.events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .withColumn("h", (unix_micros(col("hour_ts").cast("timestamp")) /
        lit(3600000000L)).cast("long"))
      .collect().map(r => ((r.getString(0), r.getLong(4)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val byType = base.keys.groupBy(_._1)
    val expect = byType.flatMap { case (et, ks) =>
      val hs = ks.map(_._2)
      val (h0, h1) = (hs.min, hs.max)
      val present = (h0 to h1).filter(h => base.contains((et, h)))
      (h0 to h1).map { h =>
        val cur = base.get((et, h))
        val filled = cur match {
          case Some((_, v)) => v
          case None =>
            val prev = present.filter(_ < h).lastOption
            val next = present.find(_ > h)
            (prev, next) match {
              case (None, Some(n)) => base((et, n))._2
              case (Some(p), None) => base((et, p))._2
              case (Some(p), Some(n)) =>
                val pv = base((et, p))._2; val nv = base((et, n))._2
                pv + (nv - pv) * ((h - p).toDouble / (n - p).toDouble)
              case _ => 0.0
            }
        }
        (et, h, cur.map(_._1).getOrElse(0L), cur.isEmpty, r4(filled + 1e-9))
      }
    }.toSet
    val got = Relational.qGapFill(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getDouble(4))).toSet
    assert(got == expect,
      s"gap-fill drift: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // the spine must actually densify: filled rows exist, and every
    // type's hour range is contiguous in the output
    assert(expect.exists(_._4), "no silent hours at this SF — spec is vacuous")
    byType.foreach { case (et, _) =>
      val hrs = expect.filter(_._1 == et).map(_._2)
      assert(hrs.max - hrs.min + 1 == hrs.size, s"spine for $et has holes")
    }
  }

  test("events_bot_detect recovers exactly the injected bot set (replay + labels)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val real = tables.events.select(col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("item"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val botTruth = real.groupBy(_._1).keys.filter(u => md5hex(u.toString)(0) == '1').toSet
    val injected = real.groupBy(_._1).collect {
      case (u, es) if botTruth(u) =>
        val us0 = es.map(_._4).min
        (0 to 24).map(i => (u, "purchase", "999", (us0 / 60000000L) * 60000000L + i * 2000000L))
    }.flatten
    val rows = real ++ injected
    val expect = rows.groupBy(_._1).map { case (u, es) =>
      val minutes = es.map(e => e._4 / 60000000L)
      val maxPerMin = minutes.groupBy(identity).values.map(_.size).max.toLong
      val nDistinct = es.map(e => (e._2, e._3, e._4 / 60000000L)).distinct.size.toLong
      val n = es.size.toLong
      val span = (es.map(_._4).max - es.map(_._4).min) / 1000000L
      val score = (if (maxPerMin >= 10) 2 else if (maxPerMin >= 5) 1 else 0) +
        (if (2 * (n - nDistinct) >= n) 1 else 0) +
        (if (n >= 100 && span <= 7200) 1 else 0)
      (u, n, maxPerMin, n - nDistinct, span, score.toLong, score >= 2)
    }.toSet
    val got = EventAnalytics.eventsBotDetect(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(got == expect,
      s"bot-score drift: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // the screen's labels must match the injected ground truth exactly
    val flagged = got.filter(_._7).map(_._1)
    assert(botTruth.nonEmpty, "injection hit no user at this SF — vacuous")
    assert(flagged == botTruth,
      s"precision/recall != 1.0: flagged=$flagged truth=$botTruth")
  }

  test("events_holt_forecast equals a raw-event integer-fold replay") {
    val raw = tables.events
      .select(col("event_type"), to_date(col("ts")).as("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    val byKey = raw.groupBy(identity).map { case (k, v) =>
      (k._1, java.time.temporal.ChronoUnit.DAYS.between(epoch, k._2)) -> v.size.toLong
    }
    val days = byKey.keys.map(_._2)
    val (d0, d1) = (days.min, days.max)
    val expect = byKey.keys.map(_._1).toSeq.distinct.map { et =>
      val xs = (d0 to d1).map(d => byKey.getOrElse((et, d), 0L)).toArray
      var l = xs(0) * 1000000L
      var b = if (xs.length >= 2) (xs(1) - xs(0)) * 1000000L else 0L
      var err = 0L
      for (i <- 1 until xs.length) {
        err += math.abs(xs(i) * 1000000L - (l + b))
        val ln = (2L * xs(i) * 1000000L + 8L * (l + b)) / 10L
        b = ((ln - l) + 9L * b) / 10L
        l = ln
      }
      (et, xs.length.toLong, l, b, l + b,
        if (xs.length > 1) err / (xs.length - 1L) else 0L)
    }.toSet
    val got = EventAnalytics.eventsHoltForecast(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect,
      s"holt drift: ${(got -- expect).take(2)} vs ${(expect -- got).take(2)}")
    // the state must differentiate across types, trends must be
    // non-degenerate somewhere, and the backtest error is positive
    assert(got.size > 1 && got.exists(_._4 != 0L))
    assert(got.forall(_._6 >= 0L) && got.exists(_._6 > 0L))
  }

  test("events_acf equals a driver-side exact-integer Pearson replay") {
    val daily = tables.events
      .groupBy(to_date(col("ts")).as("dy")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val expect = (1 to 7).flatMap { lag =>
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d.plusDays(lag.toLong)).map(y => (x, y))
      }
      if (pairs.isEmpty) None else {
        val n = pairs.size.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val r = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
        Some((lag, n, BigDecimal(java.math.BigDecimal.valueOf(r))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toSet
    val got = EventAnalytics.eventsAcf(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect,
      s"acf drift: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // the series must actually pair at every lag on a contiguous span
    assert(got.size == 7)
    assert(got.forall { case (_, _, a) => a >= -1.0 && a <= 1.0 })
  }

  test("holt-winters learns a weekly cycle that plain holt chases") {
    import spark.implicits._
    // 20 weeks of a strong period-7 pattern: weekend spikes on a flat
    // base with a mild trend — the shape the seasonal ring exists for
    val weekly = Array(100L, 100L, 100L, 100L, 100L, 400L, 500L)
    val counts = (0 until 140).map { d =>
      ("wk", d.toLong, weekly(d % 7) + d / 7)
    }.toDF("event_type", "day", "x")
    val hw = EventAnalytics.holtWintersFromCounts(counts).head()
    val holtMae = {
      // plain Holt over the same series, the shared fold replayed
      val xs = (0 until 140).map(d => weekly(d % 7) + d / 7).toArray
      var l = xs(0) * 1000000L
      var b = (xs(1) - xs(0)) * 1000000L
      var err = 0L
      for (i <- 1 until xs.length) {
        err += math.abs(xs(i) * 1000000L - (l + b))
        val ln = (2L * xs(i) * 1000000L + 8L * (l + b)) / 10L
        b = ((ln - l) + 9L * b) / 10L
        l = ln
      }
      err / (xs.length - 1L)
    }
    val hwMae = hw.getAs[Long]("mae_micro")
    assert(hwMae < holtMae,
      s"seasonal ring captured nothing: HW mae $hwMae !< Holt mae $holtMae")
    // after 20 cycles the learned components must be materially
    // seasonal: the ring's one-step-ahead component is non-zero
    assert(math.abs(hw.getAs[Long]("season_next_micro")) > 0L)
    // batch operator == streaming twin on the real corpus (pair #33
    // shares the oracle; pin the equality locally too)
    val batch = EventAnalytics.eventsHoltWinters(tables).collect()
      .map(_.toSeq).toSet
    val stream = graft.streaming.Streaming.streamHoltWinters(tables)
      .collect().map(_.toSeq).toSet
    assert(batch == stream)
    assert(batch.nonEmpty)
  }
}
