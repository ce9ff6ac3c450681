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

  /** `corpus_pipeline` — the whole training-data pipeline as ONE lazy
    * DAG, emitting a one-row release manifest: docs in → after quality
    * bar → after exact dedup → after eval-decontamination (bench docs
    * themselves leave the corpus) → train/val split counts → packed
    * shard count. The numbers every dataset release publishes, and the
    * end-to-end proof the operators compose.
    *
    * One corpus scan feeds every stage (cached tokenized projection, a
    * staging write on a real cluster). The exact-dedup representative
    * is a min window over the text hash (no groupBy+re-join of the
    * lineage); decontamination broadcasts the eval gram set; each
    * stage count is a one-row aggregate cross-joined into the
    * manifest — the counting never collects rows.
    */
  def corpusPipeline(t: Tables, qualityBar: Double = 0.5, benchDocs: Int = 10,
      tokensPerShard: Long = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val docs = t.documents
      .repartition(t.spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .persist()
    docs.count() // populate eagerly: the stage branches race the lazy cache otherwise

    // quality bar on the ROUNDED score (cross-engine stable boundary)
    val quality = docs.filter(
      TextAnalysis.qualityScoreExpr(col("text"), col("toks")) >= qualityBar)
    // exact dedup: keep the min-id representative per text hash
    val deduped = quality
      .withColumn("rep", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("rep")).drop("rep")
    // eval decontamination: drop corpus docs sharing any distinct
    // 5-gram with the bench set; bench docs leave the corpus entirely
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.ngrams(col("toks"), 5))).as("g"))
    val benchGrams = grams.filter(col("doc_id") < benchDocs).select(col("g")).distinct()
    val contaminated = grams.filter(col("doc_id") >= benchDocs)
      .join(broadcast(benchGrams), "g").select(col("doc_id")).distinct()
    val clean = deduped.filter(col("doc_id") >= benchDocs)
      .join(contaminated, Seq("doc_id"), "left_anti")
    val split = clean.withColumn("split",
      when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"), "val")
        .otherwise("train"))

    docs.agg(count(lit(1)).as("n_in"))
      .crossJoin(quality.agg(count(lit(1)).as("n_quality")))
      .crossJoin(deduped.agg(count(lit(1)).as("n_dedup")))
      .crossJoin(split.agg(
        count(lit(1)).as("n_clean"),
        count(when(col("split") === "train", 1)).as("n_train"),
        count(when(col("split") === "val", 1)).as("n_val"),
        ceil(sum(size(col("toks"))).cast("double") / tokensPerShard)
          .cast("long").as("n_shards")))
  }
}
