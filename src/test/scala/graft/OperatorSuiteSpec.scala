package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for operator specs (sf0.001 data). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"
  def tables: Tables = Tables(spark, sfDir)

  // several operators persist() small index frames and hand back a
  // lazy DataFrame (the caller can't unpersist); Verify/Bench clear
  // between queries, and the shared-session test run must too or the
  // abandoned cache blocks of one suite shrink execution memory for
  // every suite after it
  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }
}

object SparkTestSession {
  // one session across all suites — Spark startup dominates test time
  lazy val get: SparkSession = {
    val s = GraftSession.builder("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Smoke-level invariants for every SparkEntry query at sf0.001: runs,
  * non-degenerate schema, and (for most) non-empty output. Deep value
  * correctness is the driver's DuckDB gate; these specs catch
  * regressions fast and locally.
  */
class OperatorSuiteSpec extends SparkSpec {

  // queries that may legitimately return zero rows at tiny SF
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding", "q_union", "q_having", "q_semi_join",
    "q_scalar_subquery", "q22_idle_customers", "q19_disjunctive",
    "q18_large_orders", "stream_stream_join", "text_contamination",
    "text_contamination_shuffled", "dedup_incremental", "dedup_minhash_eval",
    "text_contamination_fuzzy", "dedup_containment",
    "text_contamination_bloom",
    // ±500-cent band over 10 suppliers × 15 customers: the sf0.001
    // acctbal space is sparse enough that zero pairs is the honest
    // answer (76 suppliers match at sf0.01)
    "q_abs_band_auto")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
