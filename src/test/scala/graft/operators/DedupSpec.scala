package graft.operators

import graft.SparkSpec

/** Dedup-suite invariants beyond the driver's DuckDB gate: the LSH
  * embedding-dedup scale path must reproduce the exact all-pairs
  * answer on this corpus (exhaustive recall at the chosen band
  * parameters), and the exact form stays spec-only ground truth.
  */
class DedupSpec extends SparkSpec {

  test("dedup_embedding (LSH path) equals the exact all-pairs ground truth") {
    val lsh = Dedup.dedupEmbedding(tables).collect().map(_.toSeq).toSet
    val exact = Dedup.dedupEmbeddingExact(tables).collect().map(_.toSeq).toSet
    assert(lsh == exact,
      s"missing=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty, "degenerate test: no true pairs at this SF")
  }

  test("dedup_embedding recall stays exhaustive with fewer bands removed than the margin") {
    // 25 bands is the empirical minimum for 100% recall on this
    // corpus; the default 28 carries a 3-band margin
    val lsh25 = Dedup.dedupEmbedding(tables, bitsPerBand = 4, nBands = 25)
      .collect().map(_.toSeq).toSet
    val exact = Dedup.dedupEmbeddingExact(tables).collect().map(_.toSeq).toSet
    assert(lsh25 == exact)
  }

  test("dedup_embedding recall is exhaustive at sf0.01 (the driver's verify SF)") {
    // the driver gate compares against the exact all-pairs oracle AT
    // sf0.01 — pin parity on that corpus too, not just the spec SF
    val t = graft.Tables(spark, "/root/testdata/sf0.01")
    val lsh = Dedup.dedupEmbedding(t).collect().map(_.toSeq).toSet
    val exact = Dedup.dedupEmbeddingExact(t).collect().map(_.toSeq).toSet
    assert(lsh == exact,
      s"missing=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }

  test("dedup_clusters: every near-dup pair lands in one cluster, labels are component minima") {
    val cluster = Dedup.dedupClusters(tables).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.dedupMinhashLsh(tables).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "degenerate test: no near-dup pairs at this SF")
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // a label is always a member of its own cluster and is its minimum
    cluster.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl labelled above its min member")
    }
  }
}
