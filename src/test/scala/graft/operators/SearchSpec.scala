package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for BM25 search, curriculum resampling, and
  * the lang-ID confusion matrix (value correctness is the DuckDB
  * oracle gate).
  */
class SearchSpec extends SparkSpec {

  test("bm25 returns a descending deterministic top-k of term-matching docs") {
    val terms = Seq("spark", "table", "query")
    val rows = Search.textBm25Search(tables, terms).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 1 && n <= terms.length)
    }
    // every hit really contains at least one query term
    val hitIds = rows.map(_.getLong(0)).toSeq
    val withTerm = tables.documents
      .filter(col("doc_id").isin(hitIds: _*))
      .filter(terms.map(w => col("text").contains(w)).reduce(_ || _))
      .count()
    assert(withTerm == hitIds.length)
  }

  test("curriculum keeps exactly ceil(n_band * rate) docs per quality band") {
    val kept = TextAnalysis.corpusCurriculum(tables)
      .groupBy("band").agg(count(lit(1)).as("n_kept")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bandCol = least(
      floor(TextAnalysis.qualityScoreExpr(col("text"),
        TextAnalysis.tokens(col("text"))) * 5).cast("long"), lit(4L))
    val full = tables.documents.groupBy(bandCol.as("band"))
      .agg(count(lit(1)).as("n_band")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.keySet == full.keySet)
    full.foreach { case (band, n) =>
      val quota = (n * (band * 3 + 4) + 15) / 16
      assert(kept(band) == quota, s"band $band: kept ${kept(band)}, quota $quota")
    }
  }

  test("lang confusion matrix accounts for every doc and normalizes per gold row") {
    val df = TextAnalysis.textLangConfusion(tables).cache()
    try {
      assert(df.agg(sum(col("n_docs"))).head().getLong(0) == tables.documents.count())
      val shares = df.groupBy("lang")
        .agg(sum(col("gold_share")).as("s")).collect()
      // per-cell 4-dp rounding: row sums land within rounding slack of 1
      shares.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 0.01))
    } finally df.unpersist()
  }
}
