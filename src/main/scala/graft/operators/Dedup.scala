package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions.cosineSimilarity

/** Deduplication operator suite over `documents` / `embeddings`
  * (SURVEY.md §2.3).
  *
  * Scale posture (100 TB): none of the near-dup operators ever builds
  * the O(n²) pair space directly — candidates come from inverted-index
  * joins on shingle / LSH-band / simhash-block keys, so the shuffle is
  * keyed by content hashes and each bucket is small. All hashing is
  * `md5` hex (portable to the DuckDB oracle verbatim), and the min-hash
  * "min" is plain lexicographic string order, identical cross-engine.
  */
object Dedup {

  /** Distinct word-3-gram shingles per doc: (doc_id, shingle). */
  private def shingleSet(t: Tables): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val shingles = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(3)))))
      .otherwise(array().cast("array<string>"))
    t.documents
      .select(col("doc_id"), explode(shingles).as("shingle"))
      .distinct()
  }

  /** D1 — exact dedup: group on md5(text) (shuffle a 32-char digest,
    * not the document payload), keep the min-id representative and the
    * duplicate count. At 100 TB this is the cheapest possible exact
    * dedup: one hash-aggregate keyed by digest.
    */
  def dedupExact(t: Tables): DataFrame =
    t.documents
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("dup_count"))

  /** D2 — n-gram Jaccard near-dup pairs (similarity ≥ 0.8).
    *
    * Inverted-index self-join on the shingle key produces only pairs
    * that share ≥1 shingle; the pair's intersection size falls out of
    * the same join as a count, so Jaccard is exact with no second pass
    * over the corpus. At very large corpora, add a doc-frequency cap on
    * the shingle index to bound hot keys (AQE skew-join handles the
    * residual skew here).
    */
  def dedupNgramJaccard(t: Tables): DataFrame = {
    val sh = shingleSet(t)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("na"), col("doc_id_1") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_id_2") === col("nb.doc_id"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na.ns") + col("nb.ns") - col("common")).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_id_1"), col("doc_id_2"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** D3 — MinHash + LSH candidate pairs.
    *
    * 16 MinHash signatures (min over shingles of md5("seed:shingle"),
    * lexicographic min on the hex digest) computed as 16 aggregate
    * columns in ONE pass over the shingle set — no 16× row explosion.
    * Signatures fold into 4 bands of 4; docs colliding on any
    * (band, band-hash) key become candidates. The self-join is keyed by
    * the band hash, so bucket sizes — not corpus size — bound the work.
    */
  def dedupMinhashLsh(t: Tables): DataFrame = {
    val sh = shingleSet(t)
    val minhashes = (0 until 16).map { s =>
      min(md5(concat(lit(s"$s:"), col("shingle")))).as(s"h$s")
    }
    val mh = sh.groupBy(col("doc_id")).agg(minhashes.head, minhashes.tail: _*)
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until 4).map(i => col(s"h${4 * b + i}")): _*)).as("bh"))
    }
    val bands = mh
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .distinct()
  }

  /** D4 — SimHash near-dup pairs (32-bit, hamming ≤ 3).
    *
    * Per-doc simhash is 32 weighted-bit sums computed as 32 aggregate
    * columns over the shingle multiset in one pass (bit i of a shingle
    * is nibble-extracted from its md5 hex — portable to any engine).
    * Pair generation is an exact blocking join: the 32-bit hash splits
    * into 4 bytes and hamming ≤ 3 guarantees (pigeonhole) at least one
    * equal byte, so candidates come from equality on (block, byte) and
    * only candidates pay the popcount verification.
    */
  def dedupSimhash(t: Tables): DataFrame = {
    val sh = shingleSet(t).groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("cnt")) // distinct shingles → cnt=1; keeps the multiset shape
    val h = md5(col("shingle"))
    def bit(i: Int): Column = {
      val nib = conv(substring(h, 1 + i / 4, 1), 16, 10).cast("int")
      shiftright(nib, 3 - (i % 4)).bitwiseAND(lit(1))
    }
    val bitSums = (0 until 32).map { i =>
      sum(when(bit(i) === 1, col("cnt")).otherwise(-col("cnt"))).as(s"s$i")
    }
    val perDoc = sh.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until 32).map { i =>
      when(col(s"s$i") > 0, lit(1L << (31 - i))).otherwise(0L)
    }.reduce(_ + _)
    val hashed = perDoc.select(col("doc_id"), simhash.as("simhash"))
    val blocks = hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("blk"),
          shiftright(col("simhash"), 8 * (3 - b)).bitwiseAND(lit(255L)).as("bv"))
      }: _*)).as("kb"))
      .select(col("doc_id"), col("simhash"), col("kb.blk").as("blk"), col("kb.bv").as("bv"))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  /** D5 — embedding near-dup pairs: cosine ≥ 0.4 (threshold sits in a
    * wide numeric gap in the corpus, so the cross-engine compare is
    * float-safe). Exact all-pairs via a self nested-loop join — the
    * exact baseline; the LSH-bucketed scale path is
    * [[Similarity.annLshTopK]]. Cosine is the native codegen
    * expression [[graft.functions.CosineSimilarity]].
    */
  def dedupEmbedding(t: Tables): DataFrame = {
    val e = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cos = cosineSimilarity(col("a.emb"), col("b.emb"))
    e.as("a")
      .join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_1"), col("b.vec_id").as("vec_id_2"),
        cos.as("cos"))
      .filter(col("cos") >= 0.4)
      .select(col("vec_id_1"), col("vec_id_2"), round(col("cos"), 4).as("cos_sim"))
  }
}
