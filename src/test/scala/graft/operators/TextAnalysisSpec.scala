package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards the map-side predicate twin of the language-ID argmax: the
  * fused corpus_clean path must classify exactly the docs the full
  * explode/join/window operator does, tie-breaks included.
  */
class TextAnalysisSpec extends SparkSpec {

  test("isPredLangExpr matches textLangId's argmax for every language") {
    val docs = tables.documents.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val truth = TextAnalysis.textLangId(tables)
      .select(col("doc_id"), col("lang_pred")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (lang <- Seq("de", "en", "es", "fr")) {
      val pred = docs.filter(TextAnalysis.isPredLangExpr(col("toks"), lang))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val expect = truth.collect { case (id, l) if l == lang => id }.toSet
      assert(pred == expect,
        s"$lang: missing=${(expect -- pred).take(5)} extra=${(pred -- expect).take(5)}")
    }
  }

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
