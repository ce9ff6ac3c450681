package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, TextAnalysis}

/** Dev probe: stage-wise timing of dedup_ngram_jaccard, to attribute
  * its bench cost (tokenize+shingle vs df-rank vs prefix join vs
  * verify). Usage: runMain graft.tools.BisectJaccard [sfDir]
  */
object BisectJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder("graft-bisect")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s rows=$n%-9d sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    // cumulative prefixes of the jaccard pipeline (each timing below
    // includes everything above it; deltas attribute the stages)
    val sh = t.documents
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))

    timed("scan+tokenize+shingle")(sh.count())
    timed("  +dfreq agg")(sh.groupBy(col("h")).agg(count(lit(1)).as("df")).count())
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    timed("  +rank join+pack")(
      sh.join(dfreq, "h").groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sorted")).count())
    timed("full query (cold cache)") {
      spark.catalog.clearCache()
      Dedup.dedupNgramJaccard(t).count()
    }
    timed("full query (warm cache)")(Dedup.dedupNgramJaccard(t).count())
    spark.stop()
  }
}
