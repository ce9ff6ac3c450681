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
  * Each stage is the already-verified operator; this query proves they
  * compose into one distributed plan (the common `documents` scan is
  * shared, the dup-pair set arrives as a left-anti join on doc_id).
  * The quality filter applies to the ROUNDED score — both engines
  * produce identical rounded values, so the threshold is stable
  * cross-engine even when a raw score sits exactly on the boundary.
  */
object CorpusClean {

  def corpusClean(t: Tables): DataFrame = {
    val lang = TextAnalysis.textLangId(t)
      .filter(col("lang_pred") === "en")
      .select(col("doc_id"), col("lang_pred"))
    val qual = TextAnalysis.textQuality(t)
      .filter(col("quality_score") >= 0.5)
      .select(col("doc_id"), col("quality_score"))
    val nearDups = Dedup.dedupMinhashLsh(t)
      .select(col("doc_id_2").as("doc_id"))
    lang
      .join(qual, "doc_id")
      .join(nearDups, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("quality_score"))
  }
}
