package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the embedding-corpus mining/observability
  * operators (deep value correctness is the driver's DuckDB gate).
  */
class EmbeddingMiningSpec extends SparkSpec {

  test("hard negatives never share the query's label and fill top-k per query") {
    val df = Similarity.annHardNegatives(tables).cache()
    try {
      assert(df.filter(col("neg_label") === col("q_label")).count() == 0)
      val perQuery = df.groupBy("q_id").count().collect()
      assert(perQuery.length == Similarity.NumQueries)
      assert(perQuery.forall(_.getLong(1) == Similarity.TopK))
      assert(df.filter(col("cos_sim") < -1.0 || col("cos_sim") > 1.0).count() == 0)
    } finally df.unpersist()
  }

  test("hard negatives are the cross-label subset of an unfiltered exact top ranking") {
    // for each query, every mined negative must score >= any cross-label
    // vector NOT mined (spot-check: the mined set's min cos_sim per query
    // is the true cross-label 5th best within the quantized shortlist)
    val df = Similarity.annHardNegatives(tables)
    val ranked = df.filter(col("rnk") === 1)
    // rank-1 rows must carry each query's max cos_sim
    val bad = df.as("a").join(ranked.as("b"), "q_id")
      .filter(col("a.cos_sim") > col("b.cos_sim")).count()
    assert(bad == 0)
  }

  test("PQ fills top-k per query; shortlist+rerank recalls the exact L2 top-5") {
    val pq = Similarity.annPqTopK(tables).cache()
    try {
      val perQuery = pq.groupBy("q_id").count().collect()
      assert(perQuery.length == Similarity.NumQueries)
      assert(perQuery.forall(_.getLong(1) == Similarity.TopK))
      assert(pq.filter(col("approx_dist") < 0).count() == 0)
    } finally pq.unpersist()
    // quality floor on the PRODUCTION path: PQ shortlist + exact
    // rerank must recover most of the true L2 top-5 (direct 4-bit ADC
    // ranking alone legitimately can't split rank-5 boundaries on
    // concentrated data — that's what the rerank stage is for)
    import graft.functions.VectorFunctions.l2SqDistance
    import org.apache.spark.sql.expressions.Window
    val e = tables.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val truth = e.filter(col("vec_id") >= Similarity.NumQueries)
      .join(broadcast(e.filter(col("vec_id") < Similarity.NumQueries)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))))
      .select(col("q_id"), col("vec_id"),
        l2SqDistance(col("q_emb"), col("emb")).as("d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(asc("d"), asc("vec_id"))))
      .filter(col("rnk") <= Similarity.TopK)
    val refined = Similarity.annPqRefineTopK(tables)
    val hits = refined.select("q_id", "vec_id")
      .join(truth.select("q_id", "vec_id"), Seq("q_id", "vec_id")).count()
    val total = Similarity.NumQueries * Similarity.TopK
    assert(hits * 10 >= total * 6, // recall@5 ≥ 0.6 (measured 0.84)
      s"PQ refine recall too low: $hits/$total")
    // IVF-PQ trades recall for the cell prune (scans nProbe/nCells of
    // the corpus): floor below refine's but far above chance. The
    // converged-k-means coarse quantizer lifted this from 0.38
    // (raw-seeded, r8) to 0.46 — cells that tile the data's density
    // capture more true neighbors at equal nProbe
    val ivfPq = Similarity.annIvfPqTopK(tables)
    val perQ = ivfPq.groupBy("q_id").count().collect()
    assert(perQ.length == Similarity.NumQueries &&
      perQ.forall(_.getLong(1) == Similarity.TopK))
    val ivfHits = ivfPq.select("q_id", "vec_id")
      .join(truth.select("q_id", "vec_id"), Seq("q_id", "vec_id")).count()
    assert(ivfHits * 5 >= total * 2, // recall@5 ≥ 0.4 (measured 0.46)
      s"IVF-PQ recall too low: $ivfHits/$total")
    // incremental serving (frozen history models + appended codes)
    // keeps the same contract: full top-k per query, same recall class
    val incr = Similarity.annIndexIncremental(tables)
    val incrPerQ = incr.groupBy("q_id").count().collect()
    assert(incrPerQ.length == Similarity.NumQueries &&
      incrPerQ.forall(_.getLong(1) == Similarity.TopK))
    val incrHits = incr.select("q_id", "vec_id")
      .join(truth.select("q_id", "vec_id"), Seq("q_id", "vec_id")).count()
    assert(incrHits * 5 >= total * 2, // recall@5 ≥ 0.4 (measured 0.58)
      s"incremental IVF-PQ recall too low: $incrHits/$total")
  }

  test("PQ serving runs off stored catalog artifacts (codebooks, centroids, code table)") {
    Similarity.annPqTopK(tables).count() // triggers build-once
    val names = spark.catalog.listTables().collect().map(_.name)
    for (prefix <- Seq("graft_pq_codebooks_", "graft_pq_centroids_", "graft_pq_index_"))
      assert(names.exists(_.startsWith(prefix)),
        s"missing stored index artifact $prefix* in ${names.mkString(",")}")
    // the code table is the 32×-compressed index: one row per corpus
    // vector, cell + m codes, every code within the codebook range
    val codes = spark.table(names.filter(_.startsWith("graft_pq_index_")).max)
    val nCorpus = tables.embeddings
      .filter(col("vec_id") >= Similarity.NumQueries).count()
    assert(codes.count() == nCorpus)
    assert(codes.columns.toSet ==
      (Set("vec_id", "cell") ++ (0 until Similarity.PqM).map(j => s"c$j")))
    val outOfRange = (0 until Similarity.PqM)
      .map(j => codes.filter(col(s"c$j") < 0 || col(s"c$j") >= Similarity.PqCells).count())
    assert(outOfRange.forall(_ == 0), s"codes outside [0,${Similarity.PqCells}): $outOfRange")
  }

  test("embed_pca_topk: 3 unit-norm, pairwise-orthogonal components with positive eigenvalues") {
    val rows = Similarity.embedPcaTopK(tables).collect()
    assert(rows.length == 3 * 64)
    val comps = rows.groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray).toMap
    assert(comps.keySet == Set(1, 2, 3))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (c <- 1 to 3)
      assert(math.abs(math.sqrt(dot(comps(c), comps(c))) - 1.0) < 1e-5,
        s"component $c not unit norm")
    // the per-step Gram-Schmidt projection makes orthogonality a
    // construction invariant, not a convergence outcome — even on
    // this near-degenerate spectrum (λ₂/λ₁ ≈ 0.99)
    for (a <- 1 to 3; b <- a + 1 to 3)
      assert(math.abs(dot(comps(a), comps(b))) < 1e-4,
        s"components $a,$b not orthogonal: ${dot(comps(a), comps(b))}")
    val lams = rows.groupBy(_.getInt(0)).view.mapValues(_.head.getDouble(3)).toMap
    // eigenvalue ESTIMATES: positive and within the covariance's
    // spectral range; their relative order is a convergence outcome,
    // not an invariant, on a near-degenerate spectrum — so no
    // monotonicity pin (λ₂ > λ₁ genuinely occurs at sf0.001)
    assert(lams.values.forall(_ > 0), s"non-positive eigenvalue: $lams")
    assert(lams.values.forall(_ < 1.0), s"eigenvalue beyond plausible spectrum: $lams")
  }

  test("embed_whiten: per-component coordinates are centered with ~unit variance") {
    val rows = Similarity.embedWhiten(tables).collect()
    val n = tables.embeddings.count()
    assert(rows.length == 3 * n)
    rows.groupBy(_.getInt(1)).foreach { case (comp, rs) =>
      val xs = rs.map(_.getDouble(2))
      val mean = xs.sum / xs.length
      val varr = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      // variance = vᵀΣv/λ = 1 BY CONSTRUCTION (λ is the Rayleigh
      // quotient of v) up to the 4-dp coordinate rounding
      assert(math.abs(mean) < 0.05, s"component $comp not centered: $mean")
      assert(varr > 0.9 && varr < 1.1, s"component $comp variance not ~1: $varr")
    }
  }

  test("ann_pq_recall_eval: one row per query, recall = hits/k, matches the pinned floor") {
    val rows = Similarity.annPqRecallEval(tables).collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      val (k, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k == Similarity.TopK)
      assert(hits >= 0 && hits <= k)
      assert(recall == hits.toDouble / k)
    }
    // the production serving path's aggregate recall floor (the same
    // ≥0.6 the refine spec pins, now as a WATCHABLE query)
    val total = rows.map(_.getLong(2)).sum
    assert(total * 10 >= Similarity.NumQueries * Similarity.TopK * 6,
      s"PQ refine recall below pinned floor: $total/${Similarity.NumQueries * Similarity.TopK}")
  }

  test("ann_index_drift: one row per share, recall = hits/(q*k), flag = recall < threshold") {
    val rows = Similarity.annIndexDrift(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 50, 100), rows.mkString(","))
    val denom = (Similarity.NumQueries * Similarity.TopK).toDouble
    rows.foreach { case (pct, hits, recall, flag) =>
      assert(math.abs(recall - math.rint((hits / denom + 1e-9) * 1e4) / 1e4) < 1e-12,
        s"share $pct: recall $recall != round($hits/$denom)")
      assert(flag == (if (recall < 0.35) 1 else 0),
        s"share $pct: flag $flag inconsistent with recall $recall at threshold 0.35")
    }
    // the flag must actually respond to the threshold: an impossible
    // bar flags every share
    val strict = Similarity.annIndexDrift(tables, threshold = 1.01).collect()
    assert(strict.forall(_.getInt(3) == 1), "threshold 1.01 should flag all shares")
  }

  test("embed_matryoshka_eval: full prefix recalls 1.0, all recalls = hits/(q*k)") {
    val rows = Similarity.embedMatryoshkaEval(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8, 16, 32, 64))
    val denom = (Similarity.NumQueries * Similarity.TopK).toDouble
    rows.foreach { case (p, hits, recall) =>
      assert(hits >= 0 && hits <= denom, s"prefix $p: $hits hits out of range")
      assert(math.abs(recall - math.rint((hits / denom + 1e-9) * 1e4) / 1e4) < 1e-12,
        s"prefix $p: recall $recall != round($hits/$denom)")
    }
    // the d'=64 "prefix" IS the full vector: recall must be exactly 1
    assert(rows.last._3 == 1.0, s"full-dim recall ${rows.last._3} != 1.0")
  }

  test("ann_filtered_topk: every hit satisfies the predicate, full k per query") {
    val rows = Similarity.annFilteredTopK(tables).collect()
    assert(rows.length == Similarity.NumQueries * Similarity.TopK, rows.length)
    rows.foreach { r =>
      val v = r.getLong(1)
      assert(v % 7 < 3, s"vec $v violates the label predicate")
    }
    // pre-filtering (not post-): a query's k-th hit can be a vector a
    // plain unfiltered shortlist would have cut — proven by the full-k
    // assertion above under a ~43%-selective predicate with k=5,
    // shortlist=50 (post-filtering the unfiltered top-50 to ~21 rows
    // still fills k, so the structural proof is predicate+full-k)
  }

  test("embed_whiten degrades to an empty frame on a zero-variance corpus, never throws") {
    // all-constant embeddings: covariance is identically zero, the
    // power iteration's residual is the null space — whitening must
    // follow the covMatrix-None convention (empty result), not blow
    // up in require/NaN rounding
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_const_emb_").toString
    (0L until 40L).map(i => (i, Array.fill(64)(0.5)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.embedWhiten(graft.Tables(spark, dir))
    assert(out.columns.toSeq == Seq("vec_id", "component", "coord"))
    assert(out.count() == 0, "degenerate spectrum must whiten to an empty frame")
  }

  test("dim stats profile every dimension exactly once with sane moments") {
    val stats = Similarity.embedDimStats(tables).cache()
    try {
      val nVecs = tables.embeddings.count()
      assert(stats.count() == 64)
      assert(stats.filter(col("n_vals") =!= nVecs).count() == 0)
      assert(stats.filter(col("std_v") < 0).count() == 0)
      assert(stats.filter(col("min_v") > col("max_v")).count() == 0)
      assert(stats.filter(
        col("mean_v") < col("min_v") - 0.001 || col("mean_v") > col("max_v") + 0.001)
        .count() == 0)
    } finally stats.unpersist()
  }

  test("ann_recall_eval: one row per query, hits bounded by k, recall = hits/k") {
    val rows = Similarity.annRecallEval(tables).collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      val (k, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k == 5)
      assert(hits >= 0 && hits <= k)
      assert(recall == hits.toDouble / k)
    }
    // the k-means-seeded index must retrieve SOMETHING real overall
    assert(rows.map(_.getLong(2)).sum > 0, "zero recall across every query")
  }

  test("embed_hubness: mass identity and anti-hub accounting") {
    val hist = Similarity.embedHubness(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nNodes = tables.embeddings.filter(col("vec_id") % 16 === 0).count()
    // every node is counted exactly once across the histogram
    assert(hist.map(_._2).sum == nNodes)
    // each node emits k=5 outgoing edges, so the k-occurrence mass is
    // exactly k·|V| — the identity that breaks if anti-hubs (k_occ 0)
    // were dropped or an edge double-counted
    assert(hist.map { case (occ, n) => occ * n }.sum == 5L * nNodes,
      s"mass != 5*$nNodes in ${hist.toSeq.sorted}")
    // the distribution is non-degenerate: not everyone is retrieved
    // equally often (hubness exists even at this scale)
    assert(hist.length > 1)
  }

  test("embed_knn_graph equals a naive all-pairs cosine replay") {
    val nodes = tables.embeddings
      .filter(col("vec_id") % 16 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      // same FP order as the codegen kernel: sqrt(nx)*sqrt(ny)
      BigDecimal((d / (math.sqrt(na) * math.sqrt(nb))).toString)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = nodes.flatMap { case (src, se) =>
      nodes.filter(_._1 != src)
        .map { case (dst, de) => (src, dst, cos(se, de)) }
        .sortBy { case (_, dst, s) => (-s, dst) }
        .take(5).zipWithIndex
        .map { case ((s, d, c), i) => (s, d, c, i + 1) }
    }.toSet
    val actual = Similarity.embedKnnGraph(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(nodes.length >= 2, "degenerate node slice")
    assert(actual == expected)
  }

  test("embed_drift_psi replays naively and recovers exactly the injected dims") {
    val rows = tables.embeddings.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    val bins = 10
    def binOf(v: Double) =
      math.min(math.max(math.floor((v + 1.0) * 5).toInt, 0), bins - 1)
    val counts = scala.collection.mutable.Map
      .empty[(Int, Int, Int), Long].withDefaultValue(0L) // (slice, dim, bin)
    rows.foreach { case (id, emb) =>
      val sl = (id % 2).toInt
      emb.zipWithIndex.foreach { case (v, d) =>
        val vv = if (sl == 1 && d % 8 == 0) v + 0.5 else v
        counts((sl, d, binOf(vv))) += 1
      }
    }
    val nRef = rows.count(_._1 % 2 == 0).toLong
    val nCur = rows.count(_._1 % 2 == 1).toLong
    val expected = (0 until 64).map { d =>
      val s = (0 until bins).map { b =>
        val cr = counts((0, d, b)); val cc = counts((1, d, b))
        val pP = (cr + 1).toDouble / (nRef + bins).toDouble
        val pQ = (cc + 1).toDouble / (nCur + bins).toDouble
        math.floor((pP - pQ) * math.log(pP / pQ) * 1e9 + 0.5).toLong
      }.sum
      def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      d -> ((r6(s.toDouble / 1e9 + 1e-9), s > 100000000L))
    }.toMap
    val got = Similarity.embedDriftPsi(tables).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got == expected,
      s"psi drift, e.g. ${got.find(kv => expected(kv._1) != kv._2).take(1)}")
    // the monitor recovers EXACTLY the injected dimensions
    assert(got.filter(_._2._2).keySet == (0 until 64 by 8).toSet)
  }

  test("embed_semdedup_incremental replays the asymmetric partner rule exactly") {
    val corpus = tables.embeddings.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def rawCos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double) = BigDecimal(x.toString)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // history-trained frozen models, full-corpus cosine assignment
    val sess = spark
    import sess.implicits._
    val histDf = tables.embeddings.filter(col("vec_id") >= 10 && col("vec_id") % 5 =!= 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = Similarity.kmeansCentroidsOf(histDf, 16, 4)
      .map { case (c, v) => c -> v.toArray }
    val cell = corpus.map { case (id, e) =>
      id -> cents.maxBy { case (c, ce) => (rawCos(e, ce), c) }._1
    }.toMap
    val expected = corpus.filter(_._1 % 5 == 0).flatMap { case (id, e) =>
      val partners = corpus.filter { case (o, _) =>
        o != id && cell(o) == cell(id) && (o % 5 != 0 || o < id) }
        .map { case (o, oe) => (o, r4(rawCos(oe, e))) }
        .filter(_._2 >= 0.4)
      if (partners.isEmpty) None
      else Some((id, cell(id), partners.map(_._1).min, partners.map(_._2).max))
    }.toSet
    val got = Similarity.embedSemdedupIncremental(tables).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected,
      s"incr semdedup drift: ${(got -- expected).take(3)} vs ${(expected -- got).take(3)}")
    // only increment vectors are ever removed, and a history keeper
    // may carry ANY id (it precedes by arrival, not by id)
    assert(got.forall(_._1 % 5 == 0))
    assert(expected.nonEmpty, "screen never fires — vacuous")
  }

  test("embed_semdedup equals a naive within-cell keep-first replay") {
    // independent replay: collected converged centroids → per-vector
    // argmax cell (score desc, cell desc tiebreak — the cellOf order)
    // → all within-cell lower-id partners with rounded cos >= 0.4.
    // Cross-cell duplicates are OUT OF SCOPE by design (SemDeDup's
    // documented recall trade) — the replay enforces exactly that.
    val cents = Similarity.kmeansCentroids(tables, 16, 4)
      .map { case (c, v) => c -> v.toArray }
    val corpus = tables.embeddings.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def rawCos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double) = BigDecimal(x.toString)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cell = corpus.map { case (id, e) =>
      id -> cents.maxBy { case (c, ce) => (rawCos(e, ce), c) }._1
    }.toMap
    val emb = corpus.toMap
    val expected = corpus.flatMap { case (id, e) =>
      val partners = corpus.filter { case (o, _) =>
        o < id && cell(o) == cell(id) }
        .map { case (o, oe) => (o, r4(rawCos(oe, e))) }
        .filter(_._2 >= 0.4)
      if (partners.isEmpty) None
      else Some((id, cell(id), partners.map(_._1).min, partners.map(_._2).max))
    }.toSet
    val got = Similarity.embedSemdedup(tables).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected,
      s"semdedup mismatch: ${(got -- expected).take(3)} vs ${(expected -- got).take(3)}")
    // the screen must fire on the near-dup corpus, and keep-first
    // means every keeper id precedes its duplicate
    assert(expected.nonEmpty, "no semantic duplicates found — vacuous")
    assert(expected.forall { case (id, _, keep, _) => keep < id })
  }

  test("ann_graph_topk equals a driver-side beam-walk replay and walks past its entries") {
    val all = tables.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal((d / (math.sqrt(na) * math.sqrt(nb))).toString)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val nodes = all.filter { case (id, _) => id >= 10 && id % 4 == 0 }.toMap
    val queries = all.filter(_._1 < 10).toMap
    // stored kNN subgraph: 8 neighbors, rounded-cos rank, dst ties asc
    val knn = nodes.keys.map { src =>
      src -> nodes.keys.filter(_ != src).toSeq
        .map(dst => (dst, cos(nodes(src), nodes(dst))))
        .sortBy { case (dst, s) => (-s, dst) }.take(8).map(_._1)
    }.toMap
    // the staged FIXED-CARDINALITY hub entry set: 64 highest in-degree
    // graph nodes, (deg DESC, id ASC) — the r19 bounded-seeding rule
    val inDeg = knn.values.flatten.toSeq.groupBy(identity)
      .map { case (d, xs) => d -> xs.size }
    val entries = inDeg.toSeq
      .sortBy { case (id, deg) => (-deg, id) }
      .take(64).map(_._1)
    def beamCut(q: Long, cand: Set[Long], n: Int): Seq[(Long, Double)] =
      cand.toSeq.map(v => (v, cos(queries(q), nodes(v))))
        .sortBy { case (v, s) => (-s, v) }.take(n)
    val expect = queries.keys.flatMap { qid =>
      val b0 = beamCut(qid, entries.toSet, 8).map(_._1)
      val b1 = beamCut(qid, (b0 ++ b0.flatMap(knn)).toSet, 8).map(_._1)
      beamCut(qid, (b1 ++ b1.flatMap(knn)).toSet, 5).zipWithIndex
        .map { case ((v, s), i) => (qid, v, s, i + 1) }
    }.toSet
    val got = Similarity.annGraphTopK(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expect,
      s"beam drift: ${(got -- expect).take(3)} vs ${(expect -- got).take(3)}")
    // the walk must actually use the graph: some reported neighbor is
    // NOT an entry node (pure-entry results would mean the expansions
    // are dead code)
    val entrySet = entries.toSet
    assert(got.exists { case (_, v, _, _) => !entrySet.contains(v) },
      "all results are entry nodes — beam expansion did nothing")
  }

  test("ann_graph_recall_eval: recall grows with the beam and matches a hit recount") {
    val rows = Similarity.annGraphRecallEval(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(4, 8, 16))
    // wider beams can only add candidates: recall must be monotone,
    // and the sweep must actually discriminate (else the eval is
    // measuring nothing on this corpus)
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 >= a._3 })
    assert(rows.last._3 > rows.head._3,
      s"beam sweep flat at ${rows.head._3} — eval not discriminating")
    // hit counts bounded by queries × k and consistent with recall
    rows.foreach { case (_, hits, rec) =>
      assert(hits <= 50)
      assert(math.abs(rec - hits / 50.0) < 1e-3)
    }
  }

  test("ann_graph_recall_eval fused multi-beam walk equals per-beam " +
      "annGraphTopK recounts") {
    // independent recount: run the standalone serving walk once per
    // beam width and intersect with the same brute-force truth the
    // eval uses — the fused (beam-column) walk must reproduce it
    val e = tables.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val truth = e.filter(col("vec_id") >= 10 && col("vec_id") % 4 === 0)
      .join(broadcast(queries))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.VectorFunctions
          .cosineSimilarity(col("q_emb"), col("emb")), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(desc("cos_sim"), asc("vec_id"))))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("vec_id"))
    val want = Seq(4, 8, 16).map { b =>
      b -> Similarity.annGraphTopK(tables, k = 5, beam = b)
        .select(col("q_id"), col("vec_id"))
        .join(truth, Seq("q_id", "vec_id")).count()
    }.toMap
    val got = Similarity.annGraphRecallEval(tables).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want, s"fused walk drift: $got vs $want")
  }

  test("ann_nndescent_build: recall strictly improves per round, never trapped") {
    val rows = Similarity.annNnDescentBuild(tables).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2))
    // the descent must actually DESCEND: each two-hop round finds
    // strictly more true neighbors than the last (a flat curve is the
    // single-band component trap this operator exists to avoid)
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 > a._3 },
      s"descent stalled: ${rows.map(_._3).toSeq}")
    // ...and converge toward the exact build: the 2-round graph must
    // recover a majority of the exact edges on this corpus
    assert(rows.last._4 > 0.5,
      s"round-2 recall ${rows.last._4} — init too sparse to converge")
    // per-node degree bound holds every round: ≤ graphK per source,
    // and hits can never exceed edges
    val nNodes = tables.embeddings
      .filter(col("vec_id") >= 10 && col("vec_id") % 4 === 0).count()
    rows.foreach { case (_, edges, hits, _) =>
      assert(edges <= nNodes * 8, s"degree bound broken: $edges")
      assert(hits <= edges)
    }
  }

  test("ann_index_delete: tombstoned vectors are unservable, deletes visible") {
    val served = Similarity.annIndexDelete(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the one-sided guarantee: no deleted id can appear in ANY result
    served.foreach { case (_, v) =>
      assert(v % 9 != 0, s"tombstoned vec $v served")
    }
    // and the delete must actually CHANGE results (the live serve
    // returns tombstoned ids somewhere, else the spec is vacuous)
    val live = Similarity.annIndexIncremental(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live.exists { case (_, v) => v % 9 == 0 },
      "no tombstoned id in the live top-k — delete untested")
    assert(served != live)
    // every query still gets a full page: survivors fill the slots
    assert(served.groupBy(_._1).forall(_._2.size == 5))
  }

  test("ann_nndescent_incremental: reverse update beats the stale graph") {
    val rows = Similarity.annNnDescentIncremental(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap2
    assert(rows.keySet == Set("new", "history"))
    rows.values.foreach { case (edges, hits, rec) =>
      assert(hits <= edges); assert(rec > 0.0 && rec <= 1.0)
    }
    // the reverse update is WHY history lists don't go stale: the
    // stale exact-history graph (which cannot contain any arrival)
    // must score strictly worse against the post-append truth than
    // the updated history lists do
    val emb = tables.embeddings
      .filter(col("vec_id") >= 10 && col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(d / math.sqrt(na * nb) * 1e4) / 1e4
    }
    def topk(ids: Seq[Long], of: Seq[Long]): Map[Long, Seq[Long]] =
      ids.map { s =>
        s -> of.filter(_ != s)
          .map(d => (cos(emb.toMap.apply(s), emb.toMap.apply(d)), d))
          .sortBy { case (c, d) => (-c, d) }.take(8).map(_._2)
      }.toMap
    val all = emb.map(_._1).toSeq
    val hist = all.filter(_ % 5 != 0)
    val truthHist = topk(hist, all) // post-append truth for history srcs
    val stale = topk(hist, hist)    // the pre-append stored graph
    val staleHits = hist.map(s =>
      stale(s).toSet.intersect(truthHist(s).toSet).size).sum
    val staleRecall = staleHits.toDouble / (hist.size * 8)
    assert(rows("history")._3 > staleRecall,
      s"reverse update useless: ${rows("history")._3} vs stale $staleRecall")
  }

  private implicit class RowsOps(
      val rs: Array[(String, Long, Long, Double)]) {
    def toMap2: Map[String, (Long, Long, Double)] =
      rs.map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  test("embed_mutual_knn_clusters: reciprocal filter + union-find replay") {
    val edges = Similarity.embedKnnGraph(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = edges.filter { case (s, d) => edges((d, s)) }
    val nodes = tables.embeddings.filter(col("vec_id") % 16 === 0)
      .select("vec_id").collect().map(_.getLong(0))
    // naive union-find with min-root labels
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    mutual.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = nodes.map(n => n -> find(n)).toMap
    val size = label.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val expected = nodes.map(n => (n, label(n), size(label(n)))).toSet
    val actual = Similarity.embedMutualKnnClusters(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(actual == expected)
    // the reciprocal filter must really cut edges on this corpus —
    // otherwise the test degenerates to plain kNN components
    assert(mutual.size < edges.size, "no asymmetric edges filtered")
  }

  test("embed_isotropy equals an exact BigInt replay and sits in band") {
    val vecs = tables.embeddings.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val q = vecs.map(_.map(x => BigDecimal(java.math.BigDecimal.valueOf(x * 10000))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val n = q.length.toLong
    val dims = q.head.length
    val sq2 = q.map(v => v.map(x => x * x).sum).sum
    val dimSums = (0 until dims).map(d => q.map(_(d)).sum)
    val ss = dimSums.map(s => BigInt(s) * BigInt(s)).sum
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expMean = r6(sq2.toDouble / (n * 100000000L).toDouble)
    val expCent = r6(ss.toDouble / ((n * n).toDouble * 1e8))
    val expAniso = r6(ss.toDouble / (n.toDouble * sq2.toDouble))
    val row = Similarity.embedIsotropy(tables).collect().head
    assert(row.getLong(0) == n && row.getInt(1) == dims)
    assert(row.getDouble(2) == expMean, "mean_norm2")
    assert(row.getDouble(3) == expCent, "centroid_norm2")
    assert(row.getDouble(4) == expAniso, "anisotropy")
    // a healthy random-ish cloud is NEARLY isotropic but not exactly:
    // the statistic must be positive (the centroid is off origin) and
    // far below the collapse regime
    assert(row.getDouble(4) > 0.0 && row.getDouble(4) < 0.5)
  }
}
