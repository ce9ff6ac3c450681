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

  test("events_stickiness equals a driver-side trailing-window replay") {
    def ldt(x: Any): java.time.LocalDateTime = x match {
      case t: java.sql.Timestamp => t.toLocalDateTime
      case d: java.time.LocalDateTime => d
    }
    val act = tables.events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), ldt(r.get(1))))
    val lastDay = act.map(_._2).max
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x + 1e-9))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dau = act.groupBy(_._2).map { case (d, xs) => d -> xs.length.toLong }
    val expect = act.flatMap { case (u, d) =>
      Iterator.iterate(d)(_.plusDays(1))
        .takeWhile(x => !x.isAfter(lastDay) && !x.isAfter(d.plusDays(29)))
        .map(x => (u, x))
    }.distinct.groupBy(_._2).map { case (d, xs) =>
      val mau = xs.map(_._1).distinct.length.toLong
      val dd = dau.getOrElse(d, 0L)
      (d, dd, mau, r6(dd.toDouble / mau.toDouble))
    }.toSet
    val got = EventAnalytics.eventsStickiness(tables).collect()
      .map(r => (ldt(r.get(0)), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expect,
      s"stickiness drift: ${(got -- expect).take(2)} vs ${(expect -- got).take(2)}")
    // the window must dominate the day, and the ratio must be a real
    // fraction somewhere (not a constant-1 degenerate board)
    assert(got.forall { case (_, dd, mau, s) => mau >= dd && s > 0 && s <= 1 })
    assert(got.exists(_._4 < 1.0))
  }

  test("events_markov_entropy_rate recombines from the chain's own outputs") {
    val trans = EventAnalytics.eventsTransitions(tables)
      .select(col("prev_type"), col("next_type"), col("p_next")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val pi = EventAnalytics.eventsMarkovStationary(tables).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val h9 = trans.groupBy(_._1).map { case (i, xs) =>
      i -> xs.map { case (_, _, p) =>
        math.floor(p * math.log(p) * 1e9 + 0.5).toLong }.sum }
    val acc = pi.toSeq.map { case (s, v) =>
      math.floor(v * 1e6 + 0.5).toLong * h9.getOrElse(s, 0L) }.sum
    def rnd6(x: Double): Double = java.math.BigDecimal.valueOf(x + 1e-9)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val row = EventAnalytics.eventsMarkovEntropyRate(tables).collect().head
    assert(row.getInt(0) == pi.size)
    assert(row.getDouble(1) == rnd6(-acc.toDouble / 1e15), "nats")
    assert(row.getDouble(2) == rnd6(-acc.toDouble / 1e15 / math.log(2.0)), "bits")
    // the rate is positive and bounded by the uniform-chain maximum
    assert(row.getDouble(1) > 0.0)
    assert(row.getDouble(1) <= math.log(pi.size.toDouble) + 1e-6)
  }

  test("events_ppr matches an independent integer re-derivation") {
    // same graph as pagerank, but mass starts at the hub seed and the
    // teleport returns ONLY to it — replayed exactly in integers
    val items = EventAnalytics.cappedUserItems(tables, 64)
      .collect().toList.map(r => (r.getLong(0), r.getInt(1)))
    val edges = items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a != b) yield (a, b)
    }.toSet
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val seed = deg.toSeq.map { case (i, d) => (-d, i) }.min._2
    var r = deg.keys.map(i => i -> (if (i == seed) 1000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = edges.toSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = deg.keys.map { n =>
        n -> ((if (n == seed) 150000L else 0L) + (17L * in.getOrElse(n, 0L)) / 20L)
      }.toMap
    }
    val got = EventAnalytics.eventsPpr(tables).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(got == r, s"ppr mismatch: ${(got.toSet -- r.toSet).take(3)} vs ${(r.toSet -- got.toSet).take(3)}")
    // proximity vs centrality: the personalized ranking must actually
    // differ from the global one somewhere, and differentiate
    assert(got.size > 5 && got.values.toSet.size > 1)
    val global = EventAnalytics.eventsPagerank(tables).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    def ranking(m: Map[Int, Long]) =
      m.toSeq.sortBy { case (i, s) => (-s, i) }.map(_._1)
    assert(ranking(got) != ranking(global),
      "personalization is a no-op on this graph — vacuous")
  }

  test("events_hits matches an independent integer re-derivation") {
    // replay the unnormalized bipartite mutual reinforcement in plain
    // Scala: h1 = 1000·deg(u), a1 = Σ h1, h2 = Σ a1, a2 = Σ h2 —
    // exact integers end to end, so equality is exact
    val ui = EventAnalytics.cappedUserItems(tables, 64)
      .collect().toList.map(r => (r.getLong(0), r.getInt(1)))
    val h1 = ui.groupBy(_._1).map { case (u, xs) => u -> 1000L * xs.size }
    val a1 = ui.groupBy(_._2).map { case (i, xs) =>
      i -> xs.map(x => h1(x._1)).sum }
    val h2 = ui.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(x => a1(x._2)).sum }
    val expected = ui.groupBy(_._2).map { case (i, xs) =>
      i -> (xs.size.toLong, xs.map(x => h2(x._1)).sum) }
    val got = EventAnalytics.eventsHits(tables).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // authorities must differentiate — a flat score vector means the
    // reinforcement did nothing
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("events_triangles matches a naive all-triples re-derivation") {
    // count triangles the O(n³)-obvious way on the collected edge set
    // (fine at spec scale) — the forward algorithm's oriented wedge
    // enumeration must agree node for node, proving the orientation
    // neither drops nor double-counts any triple
    val items = EventAnalytics.cappedUserItems(tables, 64)
      .collect().toList.map(r => (r.getLong(0), r.getInt(1)))
    val edges = items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a < b) yield (a, b)
    }.toSet
    val nodes = edges.flatMap(e => Set(e._1, e._2)).toList.sorted
    def adj(a: Int, b: Int) = edges.contains((a min b, a max b))
    val naive = nodes.map { n =>
      n -> (for {
        a <- nodes; if a != n && adj(n, a)
        b <- nodes; if b > a && b != n && adj(n, b) && adj(a, b)
      } yield 1).size.toLong
    }.toMap
    val got = EventAnalytics.eventsTriangles(tables).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(got == naive,
      s"triangle mismatch: ${(got.toSet -- naive.toSet).take(3)} vs ${(naive.toSet -- got.toSet).take(3)}")
    assert(got.values.sum > 0, "spec corpus has no triangles — vacuous")
    // every triangle increments exactly 3 node counters
    assert(got.values.sum % 3 == 0)
  }

  test("triangle orientation bounds wedge fan-out by out-degree") {
    // the forward algorithm's invariant: after (deg, id) orientation
    // no node's OUT-degree exceeds its undirected degree, and the
    // max out-degree is ≤ the max degree of the degree-ordered
    // suffix — for a skewed graph the hub generates no wedges
    val items = EventAnalytics.cappedUserItems(tables, 64)
      .collect().toList.map(r => (r.getLong(0), r.getInt(1)))
    val edges = items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a < b) yield (a, b)
    }.toSet
    val deg = edges.toList.flatMap(e => List(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    def ord(n: Int) = (deg(n), n)
    val outDeg = edges.toList
      .map { case (a, b) =>
        if (Ordering[(Int, Int)].lteq(ord(a), ord(b))) a else b }
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    val hub = deg.maxBy(_._2)._1
    assert(outDeg.getOrElse(hub, 0) <= deg(hub))
    // Schank–Wagner bound: max out-degree ≤ O(√m); check the concrete
    // constant-free form out_deg(v) ≤ √(2m) + 1 for every node
    val bound = math.sqrt(2.0 * edges.size) + 1
    outDeg.foreach { case (n, d) =>
      assert(d <= bound, s"node $n out-degree $d exceeds √(2m)=$bound")
    }
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

  /** Undirected distinct co-purchase edge set replayed on the driver
    * (all-time projection, the assortativity substrate). */
  private def naiveEdges(): Set[(Int, Int)] = {
    val items = EventAnalytics.cappedUserItems(tables, 64)
      .collect().toList.map(r => (r.getLong(0), r.getInt(1)))
    items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a < b) yield (a, b)
    }.toSet
  }

  /** Same-day basket edge set (the k-core substrate). */
  private def naiveDayEdges(): Set[(Int, Int)] = {
    val items = EventAnalytics.cappedDayItems(tables, 64)
      .collect().toList.map(r => ((r.getLong(0), r.getDate(1)), r.getInt(2)))
    items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a < b) yield (a, b)
    }.toSet
  }

  test("events_kcore equals a naive driver-side peel replay") {
    // k=2/rounds=6 on the sf0.001 basket graph: converged AND
    // non-trivial (some nodes peeled, some in core) — the default
    // k=5 peels this tiny graph to nothing, which the replay also
    // covers below via the fixpoint test at defaults
    val k = 2; val rounds = 6
    var edges = naiveDayEdges()
    val allNodes = edges.flatMap(e => Set(e._1, e._2))
    for (_ <- 1 to rounds) {
      val deg = edges.toList.flatMap(e => List(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val surv = deg.filter(_._2 >= k).keySet
      edges = edges.filter(e => surv(e._1) && surv(e._2))
    }
    val degF = edges.toList.flatMap(e => List(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val expect = allNodes.map(n =>
      (n, degF.getOrElse(n, 0L), degF.getOrElse(n, 0L) >= k))
    val got = EventAnalytics.eventsKcore(tables, k, rounds).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expect,
      s"kcore mismatch: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // non-vacuous both ways: the peel must remove someone and keep someone
    assert(expect.exists(_._3) && expect.exists(!_._3),
      "spec graph is degenerate — peel removed everyone or no one")
  }

  test("events_kcore adaptive local peel equals the forced-distributed loop") {
    val local = EventAnalytics.eventsKcore(tables)
    val dist = EventAnalytics.eventsKcore(tables, localMaxEdges = 0L)
    assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty)
  }

  test("events_kcore reaches its fixpoint within the bounded rounds") {
    // the bounded-round contract is only honest if the test graph has
    // actually converged: one extra round must change nothing
    val r4 = EventAnalytics.eventsKcore(tables, rounds = 4)
    val r5 = EventAnalytics.eventsKcore(tables, rounds = 5)
    assert(r4.exceptAll(r5).isEmpty && r5.exceptAll(r4).isEmpty)
  }

  test("events_neighbor_jaccard equals a naive adjacency-set replay") {
    // independent algorithm: per-edge set intersection over driver
    // adjacency maps, vs the operator's oriented-wedge enumeration
    val edges = naiveEdges()
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = edges.map { case (a, b) =>
      val common = (adj(a) & adj(b)).size.toLong
      val union = adj(a).size + adj(b).size - common
      (a, b, common, r4(common.toDouble / union.toDouble + 1e-9))
    }
    val got = EventAnalytics.eventsNeighborJaccard(tables).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect,
      s"jaccard drift: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // similarity must discriminate: not all edges score alike
    assert(expect.map(_._4).size > 1 || expect.size <= 1)
    assert(expect.exists(_._3 > 0), "no edge has a common neighbor — vacuous")
  }

  test("events_funnel_by_variant partitions the overall funnel exactly") {
    // the two arms must sum to the unsplit funnel at every step, and
    // the variant assignment must match the md5 rule per user
    val overall = EventAnalytics.eventsFunnel(tables).collect()(0)
    val arms = EventAnalytics.eventsFunnelByVariant(tables).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(arms.keySet == Set("A", "B"))
    val sums = arms.values.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    assert(sums == ((overall.getLong(0), overall.getLong(1), overall.getLong(2))),
      s"arms $sums != overall $overall")
    // rates consistent with the counts
    EventAnalytics.eventsFunnelByVariant(tables).collect().foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getLong(2).toDouble / r.getLong(1)) < 1e-3)
    }
  }

  test("events_gini equals a naive sorted-rank replay") {
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = tables.events.groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(p => (p._2, p._1))
    val n = xs.length.toLong
    val total = xs.map(_._2).sum
    val rx = xs.zipWithIndex.map { case ((_, x), i) => BigInt(i + 1) * x }.sum
    val k = n / 10
    val topx = xs.drop((n - k).toInt).map(_._2).sum
    val gini = r6(2.0 * rx.toDouble / (n.toDouble * total.toDouble)
      - (n + 1).toDouble / n.toDouble + 1e-9)
    val share = r6(topx.toDouble / total.toDouble + 1e-9)
    val row = EventAnalytics.eventsGini(tables).collect()(0)
    assert((row.getLong(0), row.getLong(1)) == ((n, total)))
    assert(row.getDouble(2) == gini, s"gini ${row.getDouble(2)} != $gini")
    assert(row.getDouble(3) == share, s"share ${row.getDouble(3)} != $share")
    // the statistic must measure real inequality on the spec corpus
    assert(gini > 0.0 && share > k.toDouble / n.toDouble)
  }

  test("events_assortativity equals an exact BigInt moment replay") {
    val edges = naiveEdges()
    val deg = edges.toList.flatMap(e => List(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> BigInt(xs.size) }
    val sym = edges.toList.flatMap(e => List(e, e.swap))
    val m = BigInt(sym.size)
    val sx = sym.map(e => deg(e._1)).sum
    val sxy = sym.map(e => deg(e._1) * deg(e._2)).sum
    val sxx = sym.map(e => deg(e._1) * deg(e._1)).sum
    val num = (m * sxy - sx * sx).toDouble
    val den = (m * sxx - sx * sx).toDouble
    // Spark's round(): BigDecimal.valueOf + setScale HALF_UP — matches
    // negatives too (away from zero), unlike a floor(x·10⁴+0.5) replay
    def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = EventAnalytics.eventsAssortativity(tables).collect()(0)
    assert(row.getLong(0) == edges.size.toLong)
    assert(row.getDouble(1) == r4(sx.toDouble / m.toDouble + 1e-9))
    val expectR = if (den == 0.0) 0.0 else r4(num / den + 1e-9)
    assert(row.getDouble(2) == expectR,
      s"r_assort ${row.getDouble(2)} != $expectR")
    assert(den != 0.0, "degree variance is zero — spec graph degenerate")
  }

  test("events_communities equals a synchronous LPA replay") {
    // replay 3 synchronous rounds in plain Scala from the same capped
    // basket item sets: labels start at own id, each round every node
    // takes its neighbors' most frequent label (count desc, label asc)
    // — integer-deterministic end to end, so equality is exact
    val items = EventAnalytics.cappedDayItems(tables, 64)
      .collect().toList.map(r => ((r.getLong(0), r.getDate(1)), r.getInt(2)))
    val edges = items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a != b) yield (a, b)
    }.toSet
    val in = edges.toList.groupBy(_._2) // dst -> incoming srcs
    var lbl = edges.map(_._1).map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = in.map { case (dst, es) =>
        val counts = es.map { case (src, _) => lbl(src) }
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        dst -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    val expected = lbl.map { case (n, l) => n -> ((l, sizes(l))) }
    val got = EventAnalytics.eventsCommunities(tables).collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == expected,
      s"LPA mismatch: ${(got.toSet -- expected.toSet).take(3)} vs ${(expected.toSet -- got.toSet).take(3)}")
    // the propagation must actually cluster: >1 community and at
    // least one community with multiple members
    assert(lbl.values.toSet.size > 1 && sizes.values.max > 1)
  }

  test("events_funnel_windowed replays naively and the windows bite") {
    import org.apache.spark.sql.functions._
    val ev = tables.events.select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, lo: Long, hi: Long): Option[Long] =
      byUser.getOrElse(u, Array.empty)
        .filter(e => e._2 == tpe && e._3 > lo && e._3 <= hi)
        .map(_._3).sorted.headOption
    val views = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "view").map(_._3).sorted.headOption.map(u -> _) }
    val clicks = views.flatMap { case (u, v) =>
      firstAfter(u, "click", v, v + 86400000000L).map(u -> _) }
    val purchases = clicks.flatMap { case (u, c) =>
      firstAfter(u, "purchase", c, c + 604800000000L).map(u -> _) }
    val row = EventAnalytics.eventsFunnelWindowed(tables).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((views.size.toLong, clicks.size.toLong, purchases.size.toLong)))
    // the bound must actually bite vs the unbounded funnel
    val unbounded = EventAnalytics.eventsFunnel(tables).collect()(0)
    assert(row.getLong(1) <= unbounded.getLong(1))
    assert(row.getLong(1) < unbounded.getLong(1) ||
      row.getLong(2) < unbounded.getLong(2),
      "windows never bind on the spec corpus — vacuous variant")
  }

  test("events_reach equals a naive BFS replay from the hub") {
    val items = EventAnalytics.cappedDayItems(tables, 64)
      .collect().toList.map(r => ((r.getLong(0), r.getDate(1)), r.getInt(2)))
    val edges = items.groupBy(_._1).values.toList.flatMap { us =>
      val is = us.map(_._2)
      for (a <- is; b <- is if a != b) yield (a, b)
    }.toSet
    val deg = edges.toList.groupBy(_._1).map { case (n, es) => n -> es.size }
    val seed = deg.toList.minBy { case (n, d) => (-d, n) }._1
    var dist = Map(seed -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = edges.toList
        .flatMap { case (s, d) => dist.get(s).map(x => d -> (x + 1)) }
      dist = (dist.toList ++ relaxed).groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).min }
    }
    val expected = deg.keys.map(n => n -> dist.getOrElse(n, -1L)).toMap
    val got = EventAnalytics.eventsReach(tables).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"reach drift: ${(got.toSet -- expected.toSet).take(3)} vs ${(expected.toSet -- got.toSet).take(3)}")
    // distances must discriminate: the seed at 0 plus >1 hop level
    assert(expected.values.toSet.size > 2, "BFS found a single hop level")
  }

  test("events_survival equals a driver-side Kaplan-Meier replay") {
    import org.apache.spark.sql.functions._
    val days = tables.events.select(col("user_id"),
        datediff(col("ts").cast("date"),
          lit(java.sql.Date.valueOf("2024-01-01"))).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = days.groupBy(_._1).map { case (u, xs) =>
      (u, xs.map(_._2).min, xs.map(_._2).max) }
    val maxDay = byUser.map(_._3).max
    // (lifetime, churned)
    val lf = byUser.toList.map { case (_, f, l) =>
      if (l < maxDay) (l - f, true) else (maxDay - f, false) }
    val total = lf.size.toLong
    val byT = lf.groupBy(_._1).toList.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    var atRiskBefore = 0L
    var s = 1000000L
    val expected = byT.map { case (t, d, c) =>
      val n = total - atRiskBefore
      atRiskBefore += d + c
      if (d > 0) s = s * (n - d) / n
      (t, n, d, c, s)
    }
    val got = EventAnalytics.eventsSurvival(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList.sortBy(_._1)
    assert(got == expected, s"KM mismatch: $got vs $expected")
    // the curve must show real churn AND real censoring (both paths)
    assert(expected.last._5 < 1000000L, "no churn observed — vacuous")
    assert(expected.map(_._4).sum > 0, "no censoring — the estimator is pointless")
  }

  test("events_seasonality_strength equals a driver-side decomposition replay") {
    import org.apache.spark.sql.functions._
    val rows = tables.events.select(col("event_type"),
        (unix_micros(date_trunc("hour", col("ts")).cast("timestamp")) /
          lit(3600000000L)).cast("long").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def exactMean(xs: Seq[Long]): Double = {
      val q = xs.map(_ * 10000L)
      math.floor((2.0 * q.sum + xs.length) / (2.0 * xs.length)) / 1e4
    }
    def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = rows.groupBy(_._1).map { case (tpe, es) =>
      val counts = es.groupBy(_._2).map { case (h, xs) => h -> xs.size.toLong }
      val spine = (counts.keys.min to counts.keys.max)
        .map(h => (h, counts.getOrElse(h, 0L)))
      val byHod = spine.groupBy { case (h, _) => (h % 24).toInt }
      val m = byHod.map { case (hod, xs) => hod -> exactMean(xs.map(_._2)) }
      val mu = exactMean(spine.map(_._2))
      val ssr = spine.map { case (h, x) =>
        val d = x - m((h % 24).toInt); math.floor(d * d * 1e4 + 0.5).toLong }.sum
      val sst = spine.map { case (_, x) =>
        val d = x - mu; math.floor(d * d * 1e4 + 0.5).toLong }.sum
      val peak = m.toList.minBy { case (hod, mm) => (-mm, hod) }._1
      val strength =
        if (sst == 0) 0.0
        else r4(math.max(0.0, 1.0 - ssr.toDouble / sst.toDouble) + 1e-9)
      tpe -> ((spine.size.toLong, peak, strength))
    }
    val got = EventAnalytics.eventsSeasonalityStrength(tables).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got == expected,
      s"strength drift, e.g. ${got.find(kv => expected(kv._1) != kv._2).take(1)}")
    // the statistic discriminates across types
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("events_changepoint equals a naive scaled-CUSUM replay") {
    import org.apache.spark.sql.functions._
    val hours = tables.events.select(
        (unix_micros(date_trunc("hour", col("ts")).cast("timestamp")) /
          lit(3600000000L)).cast("long").as("h"))
      .collect().map(_.getLong(0))
    val counts = hours.groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
    val spine = (counts.keys.min to counts.keys.max).toList
    val n = spine.size.toLong
    val tt = counts.values.sum
    var p = 0L
    val cusum = spine.zipWithIndex.map { case (h, i0) =>
      p += counts.getOrElse(h, 0L)
      (h, (i0 + 1).toLong, p, n * p - (i0 + 1).toLong * tt)
    }
    val best = cusum.minBy { case (h, _, _, c) => (-math.abs(c), h) }
    def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = EventAnalytics.eventsChangepoint(tables).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((n, tt, best._1, math.abs(best._4))))
    assert(row.getDouble(4) == r4(best._3.toDouble / best._2.toDouble + 1e-9))
    val after = (tt - best._3).toDouble / (n - best._2).toDouble
    if (n > best._2) assert(row.getDouble(5) == r4(after + 1e-9))
    // the statistic must discriminate: a flat series scores 0 everywhere
    assert(math.abs(best._4) > 0)
  }

  test("events_basket_lift: rules replay exactly; lift discriminates") {
    val baskets = tables.events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byUser = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nB = byUser.size.toLong
    val itemN = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = scala.collection.mutable.Map.empty[(Int, Int), Long]
    byUser.values.foreach { is =>
      val s = is.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        co((s(i), s(j))) = co.getOrElse((s(i), s(j)), 0L) + 1
    }
    val expected = co.filter(_._2 >= 3).map { case ((a, b), n) =>
      (a, b, itemN(a), itemN(b), n, n * 1000000L / nB,
        n * 1000000L / itemN(a), n * nB * 1000L / (itemN(a) * itemN(b)))
    }.toSet
    val got = EventAnalytics.eventsBasketLift(tables).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expected,
      s"rule drift: ${(got -- expected).take(2)} vs ${(expected -- got).take(2)}")
    assert(expected.nonEmpty, "no rule survives min-support — vacuous")
    // the measure must DISCRIMINATE: a real spread between the
    // strongest and weakest surviving rule (at the 15-basket spec
    // corpus every co≥3 rule is high-lift — the SPREAD is the
    // corpus-independent signal, not an absolute ≈1 floor)
    val lifts = got.map(_._8)
    assert(lifts.max >= 2 * lifts.min,
      s"lift flat: ${lifts.min}..${lifts.max}")
  }

  test("events_ooo_audit: replays driver-side; detects a crafted late arrival") {
    // 1) replay on the gate corpus (which is perfectly ordered —
    //    event-id sequence == event-time order, so the audit must
    //    read EXACTLY zero everywhere, not just "small")
    val rows = tables.events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(_._2)
      var runMax = Long.MinValue
      sorted.map { e =>
        val late = math.max(if (runMax > e._4) runMax - e._4 else 0L, 0L)
        runMax = math.max(runMax, e._4)
        (e._3, late)
      }
    }.groupBy(_._1).map { case (t2, xs) =>
      (t2, xs.size.toLong, xs.count(_._2 > 0).toLong,
        xs.map(_._2).max / 1000000L,
        xs.count(_._2 > 0).toLong * 1000000L / xs.size)
    }.toSet
    val got = EventAnalytics.eventsOooAudit(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(got.forall(_._3 == 0), "gate corpus should be in-order")

    // 2) the audit must DETECT: a crafted feed where event 2 arrives
    //    carrying an event time an hour before event 1's
    val dir = java.nio.file.Files.createTempDirectory("graft_ooo_")
    val sess = spark
    import sess.implicits._
    Seq(
      (1L, 1L, "click", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (1L, 2L, "click", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 1.0),
      (2L, 3L, "view", java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 1.0))
      .toDF("user_id", "event_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val crafted = EventAnalytics
      .eventsOooAudit(graft.Tables(spark, dir.toString)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(crafted("click") == ((2L, 1L, 3600L, 500000L)), crafted)
    assert(crafted("view") == ((1L, 0L, 0L, 0L)), crafted)
  }

  test("events_audience_overlap: exact Jaccard matrix replays driver-side") {
    val sets = tables.events.select(col("event_type"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val types = sets.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
      both = sets(a).intersect(sets(b)).size.toLong if both > 0
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, both,
      r4(both.toDouble / (sets(a).size + sets(b).size - both) + 1e-9))).toSet
    val got = EventAnalytics.eventsAudienceOverlap(tables).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == expected,
      s"overlap drift: ${(got -- expected).take(3)} vs ${(expected -- got).take(3)}")
    // non-degenerate: overlapping audiences exist and no pair is
    // identical (jaccard strictly inside (0, 1))
    assert(expected.nonEmpty)
    got.foreach { case (_, _, _, _, _, j) => assert(j > 0.0 && j <= 1.0) }
  }

  test("q_fk_discovery: exactly the five declared FKs are flagged") {
    val rows = graft.operators.Relational.qFkDiscovery(tables).collect()
      .map(r => (r.getString(0), r.getDouble(4), r.getBoolean(5)))
    val flagged = rows.filter(_._3).map(_._1).toSet
    assert(flagged == Set(
      "orders.o_custkey -> customer.c_custkey",
      "lineitem.l_orderkey -> orders.o_orderkey",
      "lineitem.l_partkey -> part.p_partkey",
      "lineitem.l_suppkey -> supplier.s_suppkey",
      "customer.c_nationkey -> nation.n_nationkey"), flagged)
    // the planted non-keys must show PARTIAL inclusion — the profiler
    // discriminates by measured values, not by the candidate list
    rows.filter(!_._3).foreach { case (n, inc, _) =>
      assert(inc > 0.0 && inc < 1.0, s"$n inclusion $inc not partial")
    }
  }

  test("events_srm: chi-square replays; a forced imbalance must trip the flag") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val users = tables.events.select(col("user_id")).distinct()
      .collect().map(_.getLong(0))
    val nA = users.count(u => md5hex(u.toString)(0) < '8').toLong
    val nB = users.length - nA
    def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val chi2 = r4((nA - nB).toDouble * (nA - nB) / (nA + nB) + 1e-9)
    val row = EventAnalytics.eventsSrm(tables).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getDouble(2), row.getBoolean(3))
      == ((nA, nB, chi2, chi2 > 3.841)))
    // NOTE: no "must not trip" assertion — at this 15-user spec corpus
    // the md5 split realizes 3/12 and χ² = 5.4 legitimately exceeds
    // the critical value (tiny samples ARE suspicious; the sf0.01
    // gate corpus reads 74/76 → 0.027, flag down). The spec pins the
    // formula and flag CONSISTENCY, not a corpus-dependent outcome.
    // The threshold must really bite on a textbook SRM: a 55/45
    // realization of a 50/50 design at 1000 assigned users (with 15
    // spec-corpus users even 70/30 is rightly NOT significant —
    // χ² = 2.57 — which is the statistic working, not failing)
    val forced = (550.0 - 450.0) * (550.0 - 450.0) / 1000.0
    assert(forced > 3.841, "threshold never fires on a textbook SRM")
  }

  test("events_did: cell means replay in BigInt, DiD is their combination") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = tables.events
      .select(col("user_id"), col("ts").cast("date").as("d"), col("value"))
      .collect().map { r =>
        val variant = if (md5hex(r.getLong(0).toString)(0) < '8') "A" else "B"
        val day = r.getDate(1).toLocalDate.toEpochDay -
          java.time.LocalDate.of(2024, 1, 1).toEpochDay
        val period = if (day < 15) "pre" else "post"
        (variant, period, r.getDouble(2))
      }
    def cell(v: String, p: String): (Long, Double) = {
      val vs = rows.filter(r => r._1 == v && r._2 == p).map(_._3)
      val q = vs.map(x => BigInt(math.floor(x * 1e4 + 0.5).toLong)).sum
      val n = BigInt(vs.length)
      (vs.length.toLong,
        ((BigInt(2) * q + n) / (BigInt(2) * n)).toDouble / 1e4)
    }
    val (napre, mapre) = cell("A", "pre"); val (napo, mapo) = cell("A", "post")
    val (nbpre, mbpre) = cell("B", "pre"); val (nbpo, mbpo) = cell("B", "post")
    def r4(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = EventAnalytics.eventsDid(tables).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((napre, napo, nbpre, nbpo)))
    assert((row.getDouble(4), row.getDouble(5), row.getDouble(6),
      row.getDouble(7)) == ((mapre, mapo, mbpre, mbpo)))
    assert(row.getDouble(8) == r4((mbpo - mbpre) - (mapo - mapre) + 1e-9))
    // every cell populated — the panel design is non-degenerate here
    assert(Seq(napre, napo, nbpre, nbpo).forall(_ > 0))
  }
  test("events_shortest_paths equals a driver-side BFS replay") {
    val t = tables
    val got = EventAnalytics.eventsShortestPaths(t).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap

    // independent ground truth: rebuild the supported edge set with
    // plain DataFrame ops, then BFS with a Scala queue
    val items = EventAnalytics.cappedUserItems(t, 64).persist()
    val nUsers = items.select(col("user_id")).distinct().count()
    val minSup = math.max(2L, nUsers / 50)
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item"), col("b.item")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSup)
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    items.unpersist()
    val adj = scala.collection.mutable.Map.empty[Int, List[Int]]
      .withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = scala.collection.mutable.Map.empty[Int, Int]
    var frontier = nodes.filter(_ % 17 == 0).toList
    frontier.foreach(n => want(n) = 0)
    for (d <- 1 to 4) {
      frontier = frontier.flatMap(adj).distinct.filterNot(want.contains)
      frontier.foreach(n => want(n) = d)
    }
    assert(got == want.toMap,
      s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
    // non-degenerate at this SF: real multi-hop structure, and the
    // significance floor actually removed saturating edges
    assert(got.values.exists(_ >= 2), s"graph saturated: ${got.values.toSeq.distinct}")
    assert(got.nonEmpty && got.values.exists(_ == 0))
  }

  test("events_weighted_paths equals a driver-side Dijkstra replay") {
    val t = tables
    val budget = 9L
    val got = EventAnalytics.eventsWeightedPaths(t).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap

    // independent ground truth: rebuild the weighted edge set with
    // plain DataFrame ops, then multi-source Dijkstra with a Scala
    // priority queue and the same budget cut
    val items = EventAnalytics.cappedUserItems(t, 64).persist()
    val nUsers = items.select(col("user_id")).distinct().count()
    val minSup = math.max(2L, nUsers / 50)
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item"), col("b.item")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSup)
      .collect().map(r => (r.getInt(0), r.getInt(1), 2L + r.getLong(2) % 3L))
    items.unpersist()
    val adj = scala.collection.mutable.Map.empty[Int, List[(Int, Long)]]
      .withDefaultValue(Nil)
    pairs.foreach { case (a, b, c) =>
      adj(a) = (b, c) :: adj(a); adj(b) = (a, c) :: adj(b) }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = scala.collection.mutable.Map.empty[Int, Long]
    val pq = scala.collection.mutable.PriorityQueue
      .empty[(Long, Int)](Ordering.by[(Long, Int), Long](_._1).reverse)
    nodes.filter(_ % 17 == 0).foreach(n => pq.enqueue((0L, n)))
    while (pq.nonEmpty) {
      val (d, n) = pq.dequeue()
      if (!want.contains(n) && d <= budget) {
        want(n) = d
        adj(n).foreach { case (m, c) =>
          if (!want.contains(m) && d + c <= budget) pq.enqueue((d + c, m)) }
      }
    }
    assert(got == want.toMap,
      s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)} " +
        s"diff=${want.collect { case (k, v) if got.get(k).exists(_ != v) =>
          (k, v, got(k)) }.take(5)}")
    // non-degenerate: weights genuinely reroute at least one node —
    // its min COST path differs from 2×(hop distance), i.e. a longer
    // hop path with cheaper edges won, or an expensive direct edge
    // pushed the cost above 2 hops' worth
    val hops = EventAnalytics.eventsShortestPaths(t).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got.exists { case (n, d) =>
      hops.get(n).exists(h => d != 2L * h && d != 3L * h && d != 4L * h) } ||
      got.exists { case (n, d) => hops.get(n).exists(h => h >= 2 && d < 4L * h) },
      "degenerate: costs are a constant multiple of hops everywhere")
    assert(got.nonEmpty && got.values.exists(_ == 0L))
    assert(got.values.exists(_ >= 4L), s"${got.values.toSeq.distinct.sorted}")
  }

  test("events_shortest_paths adaptive local walk equals the " +
      "forced-distributed loop (rows AND schema)") {
    val local = EventAnalytics.eventsShortestPaths(tables)
    val dist = EventAnalytics.eventsShortestPaths(tables, localMaxEdges = 0L)
    assert(local.schema == dist.schema,
      s"schema drift: ${local.schema} vs ${dist.schema}")
    assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty)
  }

  test("events_weighted_paths adaptive local walk equals the " +
      "forced-distributed loop (rows AND schema)") {
    val local = EventAnalytics.eventsWeightedPaths(tables)
    val dist = EventAnalytics.eventsWeightedPaths(tables, localMaxEdges = 0L)
    assert(local.schema == dist.schema,
      s"schema drift: ${local.schema} vs ${dist.schema}")
    assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty)
  }

}
