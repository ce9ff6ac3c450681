package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-corpus cleaning (SURVEY.md §2 composite): the
  * flagship composition of the LLM-data operators —
  *
  *   keep documents that (1) language-ID as English, (2) clear the
  *   quality-score bar, and (3) are not the higher-id member of a
  *   MinHash-LSH near-duplicate pair.
  *
  * One corpus scan, not three: the tokenized projection (doc_id, text,
  * toks) is computed once and cached, then (a) language-ID and quality
  * are evaluated MAP-SIDE over it as pure column expressions
  * ([[TextAnalysis.isPredLangExpr]] / [[TextAnalysis.qualityScoreExpr]]
  * — the per-doc argmax shuffle of the standalone `text_lang_id`
  * operator is waste when only the "is English" predicate is needed),
  * and (b) the MinHash-LSH dup pairs are generated from the same
  * cached projection via [[Dedup.minhashPairsFrom]]. On a cluster the
  * cached projection is a staging write; the only shuffles left are
  * the MinHash signature aggregate, the band candidate join, and the
  * final left-anti join on doc_id.
  *
  * The quality filter applies to the ROUNDED score — both engines
  * produce identical rounded values, so the threshold is stable
  * cross-engine even when a raw score sits exactly on the boundary.
  */
object CorpusClean {

  def corpusClean(t: Tables): DataFrame = {
    val docs = t.documents
      .repartition(t.spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .persist()

    val kept = docs
      .filter(TextAnalysis.isPredLangExpr(col("toks"), "en"))
      .select(col("doc_id"), lit("en").as("lang_pred"),
        TextAnalysis.qualityScoreExpr(col("text"), col("toks")).as("quality_score"))
      .filter(col("quality_score") >= 0.5)

    val nearDups = Dedup.minhashPairsFrom(Dedup.shingleSetFrom(docs))
      .select(col("doc_id_2").as("doc_id"))

    kept.join(nearDups, Seq("doc_id"), "left_anti")
  }
}
