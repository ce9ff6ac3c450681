package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.tokens

/** Keyword search over the document corpus: the retrieval half of a
  * data platform — dedup/decontamination find what a corpus contains,
  * search finds WHERE. BM25 is the standard lexical ranking function
  * (Robertson/Spärck Jones probabilistic relevance framework — public
  * literature), and its every input (tf, df, doc length, corpus
  * averages) is a relational aggregate, so the whole ranker is plain
  * declarative Spark.
  */
object Search {

  /** `text_bm25_search` — top-k BM25 ranking of the corpus against a
    * fixed conjunction-free keyword query.
    *
    * Scale shape, stage by stage:
    *  - doc lengths are a MAP-ONLY projection (`size(tokens)`) — no
    *    explode, no shuffle; a second scan of `documents`, deliberately:
    *    deriving lengths from the exploded token stream would shuffle
    *    every token in the corpus, while this scan shuffles nothing.
    *  - tf explodes tokens but filters to the query terms BEFORE the
    *    (doc, term) aggregation, so the shuffle carries only matching
    *    occurrences — selectivity does the work, the corpus never
    *    shuffles.
    *  - df aggregates the tf rollup down to one row PER TERM and
    *    broadcast-joins it back — deliberately NOT the count-window
    *    form used where keys are high-cardinality (grams, users):
    *    a window partitioned by a handful of query terms would stream
    *    every matching doc of a common term through ONE task. The
    *    rejoin does not rescan the corpus: both branches hang off the
    *    tf aggregation's exchange, which AQE reuses (plan-pinned).
    *    Corpus N and avgdl ride in as a one-row broadcast.
    *  - the final top-k is `orderBy(...).limit(k)` — Spark plans
    *    TakeOrderedAndProject (per-partition bounded heaps + a k-row
    *    driver merge), NOT a single-partition global sort; ranking by
    *    the ROUNDED score with a doc_id tie-break keeps the cut
    *    deterministic cross-engine.
    */
  def textBm25Search(t: Tables,
      terms: Seq[String] = Seq("spark", "table", "query"),
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lens = t.documents
      .select(col("doc_id"), size(tokens(col("text"))).cast("double").as("dl"))
    val stats = lens.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = t.documents
      .repartition(t.spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfCounts = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf
      .join(broadcast(dfCounts), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      // constants as lit(k1 + 1.0) etc.: the ORACLE computes the same
      // (1.2+1.0) expression, so both engines hold bit-identical
      // doubles (a decimal literal 2.2 differs from 1.2+1.0 by 1 ulp)
      .withColumn("contrib",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")) + lit(1e-9), 4).as("bm25"),
        count(lit(1)).as("n_terms"))
      .orderBy(desc("bm25"), asc("doc_id"))
      .limit(k)
  }

  /** `doc_ann_topk` — document similarity SEARCH over the
    * hashing-trick vectors ([[TextAnalysis.corpusDocEmbedding]]):
    * per query doc (the lowest `nQueries` ids), the top-k most
    * cosine-similar corpus docs. The semantic complement of BM25
    * (bag-of-features similarity vs keyword relevance), and the
    * concrete closure of the docs → vectors → search loop: the vector
    * table an operator produced IS the index another serves from.
    *
    * Scale shape: the sparse-vector similarity join — the tiny query
    * slice broadcast-joins the corpus vectors ON THE DIMENSION key,
    * so the dot products reduce by (query, doc)-keyed partial agg;
    * the corpus side never self-joins and vectors never shuffle
    * whole. All dots and norms are EXACT integers (the hashed vectors
    * are signed counts); the one division + sqrt runs on identical
    * operands in both engines, then rounds at 4 dp.
    */
  def docAnnTopK(t: Tables, nQueries: Int = 10, k: Int = 5): DataFrame =
    docAnnRanked(t, nQueries).filter(col("rnk") <= k)

  /** `search_hybrid_rrf` — HYBRID retrieval: the lexical-overlap
    * ranking and the hashed-vector cosine ranking fused by Reciprocal
    * Rank Fusion (score = Σ 1/(K+rank), K = 60 — the parameter-free
    * fusion every hybrid RAG stack runs, public Cormack/Clarke/
    * Buettcher formulation). Lexical recall catches exact-term
    * matches embeddings blur; vector recall catches paraphrase
    * overlap lexical misses; RRF needs no score calibration because
    * it consumes only the RANKS — which are exact integers here, so
    * the fused scores are bit-identical cross-engine (one division
    * per term on identical operands, fixed sem-then-lex sum order).
    *
    * Shape: both candidate lists are top-`perList` per query doc
    * (bounded), the fusion is a full-outer join of two
    * (queries × perList)-row frames — metadata-scale regardless of
    * corpus size; the heavy work is the two underlying rankings,
    * each already keyed/broadcast-shaped.
    */
  def searchHybridRrf(t: Tables, nQueries: Int = 10, perList: Int = 20,
      k: Int = 5, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sem = docAnnRanked(t, nQueries).filter(col("rnk") <= perList)
      .select(col("q_doc"), col("doc_id"), col("rnk").as("sem_rnk"))
    val dtk = t.documents
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    val qt = dtk.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_doc"), col("tok"))
    val lex = dtk.filter(col("doc_id") >= nQueries)
      .join(broadcast(qt), Seq("tok"))
      .groupBy(col("q_doc"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("lex_rnk", row_number().over(
        Window.partitionBy(col("q_doc")).orderBy(desc("n_shared"), asc("doc_id"))))
      .filter(col("lex_rnk") <= perList)
      .select(col("q_doc"), col("doc_id"), col("lex_rnk"))
    sem.join(lex, Seq("q_doc", "doc_id"), "full_outer")
      .select(col("q_doc"), col("doc_id"),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("sem_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rnk")), lit(0.0)) + lit(1e-9), 6)
          .as("rrf_score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_doc")).orderBy(desc("rrf_score"), asc("doc_id"))))
      .filter(col("rnk") <= k)
  }

  /** The full hashed-vector cosine ranking (unbounded rnk) both
    * search entrypoints cut from. */
  private def docAnnRanked(t: Tables, nQueries: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = TextAnalysis.corpusDocEmbedding(t)
    val norms = vecs.groupBy(col("doc_id"))
      .agg(sum(col("val") * col("val")).as("nn"))
    val qv = vecs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_doc"), col("pos"), col("val").as("q_val"))
    val dots = vecs.filter(col("doc_id") >= nQueries)
      .join(broadcast(qv), Seq("pos"))
      .groupBy(col("q_doc"), col("doc_id"))
      .agg(sum(col("q_val") * col("val")).as("dp"))
    // Broadcast ONLY the query slice of the norms (≤ nQueries rows) —
    // broadcasting the full norms frame would build a corpus-sized
    // hash relation on every executor (one row per document: the
    // classic non-broadcastable broadcast at 100 TB). The corpus-side
    // norms join below stays a shuffled equi-join, which is correct:
    // that side IS corpus-sized.
    dots
      .join(broadcast(norms.filter(col("doc_id") < nQueries)
        .select(col("doc_id").as("q_doc"), col("nn").as("qn"))), Seq("q_doc"))
      .join(norms.withColumnRenamed("nn", "cn"), Seq("doc_id"))
      .select(col("q_doc"), col("doc_id"),
        round(col("dp").cast("double") /
          sqrt((col("qn") * col("cn")).cast("double")) + lit(1e-9), 4).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_doc")).orderBy(desc("cos_sim"), asc("doc_id"))))
  }
}
