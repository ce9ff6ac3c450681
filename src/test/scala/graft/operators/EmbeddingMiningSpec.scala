package graft.operators

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
}
