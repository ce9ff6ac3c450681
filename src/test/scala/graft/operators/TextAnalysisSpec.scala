package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards the shared quality-score expression corpus_clean fuses into
  * its single-scan pipeline: it must score exactly as the standalone
  * text_quality operator.
  */
class TextAnalysisSpec extends SparkSpec {

  test("quality scores from the shared expression match textQuality") {
    val viaOp = TextAnalysis.textQuality(tables)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaExpr = tables.documents
      .select(col("doc_id"), TextAnalysis.qualityScoreExpr(col("text"),
        TextAnalysis.tokens(col("text"))).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaOp == viaExpr)
  }
}
