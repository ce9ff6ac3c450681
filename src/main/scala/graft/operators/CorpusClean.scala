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
  * toks) is computed once and cached (a staging write on a real
  * cluster), and all three stages consume it — language-ID as the
  * explode → broadcast-lexicon join → per-doc argmax (all codegen;
  * counting hits with interpreted higher-order `filter` lambdas
  * instead benches ~2× slower, the SURVEY §8 HOF trap), quality as
  * map-side column expressions ([[TextAnalysis.qualityScoreExpr]],
  * shared with `text_quality`), and the MinHash-LSH dup pairs via
  * [[Dedup.minhashPairsFrom]].
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
    docs.count() // populate eagerly: the three stages race the lazy cache otherwise

    val enDocs = TextAnalysis.langArgmax(
        docs.select(col("doc_id"), explode(col("toks")).as("tok")))
      .filter(col("slang") === "en")
      .select(col("doc_id"), lit("en").as("lang_pred"))

    val kept = docs
      .select(col("doc_id"),
        TextAnalysis.qualityScoreExpr(col("text"), col("toks")).as("quality_score"))
      .filter(col("quality_score") >= 0.5)
      .join(enDocs, "doc_id")
      .select(col("doc_id"), col("lang_pred"), col("quality_score"))

    val nearDups = Dedup.minhashPairsFrom(Dedup.shingleSetFrom(docs))
      .select(col("doc_id_2").as("doc_id"))

    kept.join(nearDups, Seq("doc_id"), "left_anti")
  }
}
