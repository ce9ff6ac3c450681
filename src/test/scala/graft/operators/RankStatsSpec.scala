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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("events_welch_ttest equals the scalar Welch replay over " +
      "per-user totals") {
    val perUser = tables.events
      .select(col("user_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq
    val (a, b) = perUser.partition { case (u, _) =>
      md5Hex(u.toString).head < '8' }
    def mom(xs: Seq[Long]) = {
      val n = xs.size.toDouble
      val mean = xs.map(_.toDouble).sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
      (n, mean, v)
    }
    val (na, ma, va) = mom(a.map(_._2)); val (nb, mb, vb) = mom(b.map(_._2))
    val t = (mb - ma) / math.sqrt(va / na + vb / nb)
    val q = va / na + vb / nb
    val df = q * q / (va / na * (va / na) / (na - 1) +
      vb / nb * (vb / nb) / (nb - 1))
    val r = EventAnalytics.eventsWelchTtest(tables).head()
    assert((r.getLong(0), r.getLong(1)) == (a.size.toLong, b.size.toLong))
    // the replay computes variances via the centered two-pass formula
    // (a DIFFERENT evaluation order than the operator's moment tree —
    // agreement proves the identity), so compare at tolerance
    assert(math.abs(r.getDouble(2) - ma) < 1e-3, s"mean_a ${r.getDouble(2)} vs $ma")
    assert(math.abs(r.getDouble(3) - mb) < 1e-3)
    assert(math.abs(r.getDouble(4) - t) < 1e-3, s"t ${r.getDouble(4)} vs $t")
    assert(math.abs(r.getDouble(5) - df) < 0.05, s"df ${r.getDouble(5)} vs $df")
  }

  test("stream_welch_ttest == events_welch_ttest (equivalence pair #41)") {
    val b = EventAnalytics.eventsWelchTtest(tables).head()
    val s = graft.streaming.Streaming.streamWelchTtest(tables).head()
    assert(b.toSeq == s.toSeq)
  }

  test("events_chisq: cells replay exactly, the total is the integer " +
      "sum of the cells, and independence of a constant split is ~0") {
    val cells = tables.events
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0),
        if (md5Hex(r.getLong(1).toString).head < '8') "A" else "B"))
    val byType = cells.groupBy(_._1).view.mapValues { vs =>
      (vs.count(_._2 == "A").toLong, vs.count(_._2 == "B").toLong)
    }.toMap
    val totA = byType.values.map(_._1).sum
    val totB = byType.values.map(_._2).sum
    val rows = EventAnalytics.eventsChisq(tables).collect()
    assert(rows.map(_.getString(0)).toSet == byType.keySet)
    var cellSum = 0L
    rows.foreach { r =>
      val (ea, eb) = byType(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) == (ea, eb), r.getString(0))
      // replay the per-cell contribution in the operator's own tree
      val eA = ((ea + eb) * totA).toDouble / (totA + totB)
      val eB = ((ea + eb) * totB).toDouble / (totA + totB)
      val chi = (ea - eA) * (ea - eA) / eA + (eb - eB) * (eb - eB) / eB
      assert(math.abs(r.getLong(4) - math.floor(chi * 10000.0 + 0.5).toLong)
        <= 1L, s"${r.getString(0)}: ${r.getLong(4)} vs $chi")
      cellSum += r.getLong(4)
      assert(r.getLong(6) == byType.size.toLong - 1L) // df = k−1
    }
    // the total is an ORDER-INDEPENDENT integer sum of the cells
    assert(rows.forall(_.getLong(5) == cellSum))
  }

  test("events_theilsen equals the exact pairwise-slope replay " +
      "(truncating ppm, lower median)") {
    val daily = tables.events
      .select(col("event_type"),
        datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("2024-01-01"))).cast("long").as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).collect {
      case (tpe, ds) if ds.length > 1 =>
        val pts = ds.map(x => (x._2, x._3)).sortBy(_._1)
        val slopes = (for {
          i <- pts.indices; j <- (i + 1) until pts.length
        } yield ((pts(j)._2 - pts(i)._2) * 1000000L) / (pts(j)._1 - pts(i)._1))
          .sorted // Scala / on Long truncates toward zero, like DIV
        tpe -> ((ds.length.toLong, slopes.size.toLong,
          slopes((slopes.size + 1) / 2 - 1)))
    }.toMap
    val got = EventAnalytics.eventsTheilSen(tables).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected,
      s"diff=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("stream_theilsen == events_theilsen (equivalence pair #43)") {
    val b = EventAnalytics.eventsTheilSen(tables).collect().map(_.toSeq)
    val s = graft.streaming.Streaming.streamTheilSen(tables)
      .collect().map(_.toSeq)
    assert(b.toSeq == s.toSeq)
  }

  test("stream_bootstrap_ci == events_bootstrap_ci (equivalence " +
      "pair #44), and the CI brackets the point estimate") {
    val b = EventAnalytics.eventsBootstrapCi(tables).head()
    val s = graft.streaming.Streaming.streamBootstrapCi(tables).head()
    assert(b.toSeq == s.toSeq)
    assert(b.getLong(3) <= b.getLong(2) && b.getLong(2) <= b.getLong(4),
      s"CI [${b.getLong(3)}, ${b.getLong(4)}] misses the mean ${b.getLong(2)}")
  }

  test("stream_sequential_ab == events_sequential_ab (equivalence " +
      "pair #45)") {
    val b = EventAnalytics.eventsSequentialAb(tables).collect().map(_.toSeq)
    val s = graft.streaming.Streaming.streamSequentialAb(tables)
      .collect().map(_.toSeq)
    assert(b.toSeq == s.toSeq)
  }

  test("stream_chisq == events_chisq (equivalence pair #42)") {
    val b = EventAnalytics.eventsChisq(tables).collect().map(_.toSeq)
    val s = graft.streaming.Streaming.streamChisq(tables)
      .collect().map(_.toSeq)
    assert(b.toSeq == s.toSeq)
  }

  test("events_sequential_ab: cumulative counts are monotone, the " +
      "final day matches the full-horizon panel, and z replays") {
    val rows = EventAnalytics.eventsSequentialAb(tables).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(p, q) =>
        assert(q.getLong(1) >= p.getLong(1) && q.getLong(2) >= p.getLong(2)
          && q.getLong(3) >= p.getLong(3) && q.getLong(4) >= p.getLong(4),
          s"cumulative counts regressed at ${q.get(0)}")
      case _ => ()
    }
    // full-horizon panel replay of the last day's cumulative counts
    val panel = tables.events
      .select(col("user_id"), to_date(col("ts")).as("day"),
        (col("event_type") === "purchase" && col("value") > 180).as("hit"))
      .collect().groupBy(r => (r.getLong(0), r.getDate(1)))
      .toSeq.map { case ((u, _), es) =>
        (md5Hex(u.toString).head < '8', es.exists(_.getBoolean(2))) }
    val last = rows.last
    assert(last.getLong(1) == panel.count(_._1).toLong)
    assert(last.getLong(2) == panel.count(p => p._1 && p._2).toLong)
    assert(last.getLong(3) == panel.count(!_._1).toLong)
    assert(last.getLong(4) == panel.count(p => !p._1 && p._2).toLong)
    // the z at the final day replays the pooled two-proportion formula
    val (na, ca2) = (last.getLong(1).toDouble, last.getLong(2).toDouble)
    val (nb, cb2) = (last.getLong(3).toDouble, last.getLong(4).toDouble)
    val pp = (ca2 + cb2) / (na + nb)
    val z = (cb2 / nb - ca2 / na) /
      math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
    assert(math.abs(last.getDouble(5) - z) < 1e-3,
      s"z ${last.getDouble(5)} vs $z")
    assert(last.getBoolean(6) == (math.abs(z) >= 2.797))
  }

  test("text_chunk_plan tiles every document: stride-48 starts, " +
      "64-token windows, full coverage, md5 content proof") {
    val chunks = TextAnalysis.textChunkPlan(tables).collect()
      .groupBy(_.getLong(0))
    val docs = tables.documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.foreach { case (id, toks) =>
      val cs = chunks.getOrElse(id,
        { assert(toks.isEmpty, s"doc $id lost"); Array.empty })
        .sortBy(_.getLong(1))
      if (toks.nonEmpty) {
        assert(cs.head.getLong(2) == 0L, s"doc $id: first chunk not at 0")
        assert(cs.last.getLong(3) == toks.size.toLong,
          s"doc $id: tail tokens dropped")
        cs.zipWithIndex.foreach { case (c, k) =>
          assert(c.getLong(1) == k.toLong)
          assert(c.getLong(2) == 48L * k)
          assert(c.getLong(3) == math.min(48L * k + 64L, toks.size.toLong))
          assert(c.getLong(4) == c.getLong(3) - c.getLong(2))
          assert(c.getLong(4) >= 1L && c.getLong(4) <= 64L)
          val want = toks.slice(c.getLong(2).toInt, c.getLong(3).toInt)
            .mkString(" ")
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(want.getBytes("UTF-8")).map("%02x".format(_)).mkString
          assert(c.getString(5) == md, s"doc $id chunk $k content drifted")
        }
      }
    }
  }

  test("corpus_source_overlap: the matrix is internally consistent " +
      "(complete upper triangle, bounded intersections, exact ppm)") {
    val rows = graft.operators.Dedup.corpusSourceOverlap(tables).collect()
    val sources = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val (n1, n2, common) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(s1 < s2, s"not canonical: $s1 $s2")
      assert(common >= 1L && common <= math.min(n1, n2),
        s"$s1/$s2: impossible intersection $common of $n1/$n2")
      assert(r.getLong(5) == common * 1000000L / (n1 + n2 - common),
        s"$s1/$s2: ppm drifted")
    }
    // at this corpus every source pair shares at least one 3-gram, so
    // the upper triangle is complete
    assert(rows.length == sources.length * (sources.length - 1) / 2,
      s"${rows.length} pairs over ${sources.length} sources")
  }
}
