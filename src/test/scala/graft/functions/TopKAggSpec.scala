package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The native bounded top-k aggregate (SURVEY §2 F1): survivor set is
  * a pure function of the group's row set (total order (score DESC,
  * id ASC)), state never exceeds k, and the partial→final merge path
  * (exercised by any real shuffle) must agree with a single-pass
  * reference. The plan must be ObjectHashAggregate with a PARTIAL
  * stage before the exchange — the whole point vs the rank window.
  */
class TopKAggSpec extends SparkSpec {

  private def topk(rows: Seq[(Int, Double, Long)], k: Int,
      partitions: Int = 7): Map[Int, Seq[(Double, Long)]] = {
    val sess = spark
    import sess.implicits._
    rows.toDF("g", "s", "i")
      .repartition(partitions) // forces partial buffers + merge()
      .groupBy($"g").agg(TopKByAgg.topKBy($"s", $"i", k).as("tk"))
      .collect()
      .map(r => r.getInt(0) ->
        r.getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1))))
      .toMap
  }

  /** reference: full sort, take k. */
  private def ref(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortBy { case (s, i) => (-s, i) }.take(k)

  test("matches a sort-take reference incl. ties, across partitionings") {
    val rnd = new scala.util.Random(7)
    // scores drawn from a tiny set so ties are dense — the tiebreak
    // (id ASC at equal score) must decide survivors deterministically
    val rows = (1L to 500L).map(i => ((i % 3).toInt, rnd.nextInt(5) / 10.0, i))
    for (p <- Seq(1, 4, 13)) {
      val got = topk(rows, 7, p)
      for (g <- 0 to 2) {
        val expect = ref(rows.filter(_._1 == g).map(r => (r._2, r._3)), 7)
        assert(got(g) == expect, s"group $g partitions $p")
      }
    }
  }

  test("k larger than the group returns the whole group sorted") {
    val rows = Seq((0, 1.0, 5L), (0, 3.0, 2L), (0, 3.0, 1L))
    assert(topk(rows, 100)(0) == Seq((3.0, 1L), (3.0, 2L), (1.0, 5L)))
  }

  test("null scores and ids are skipped, not ranked") {
    val sess = spark
    import sess.implicits._
    val df = Seq[(Integer, java.lang.Double, java.lang.Long)](
      (0, 5.0, null), (0, null, 1L), (0, 2.0, 2L))
      .toDF("g", "s", "i")
    val out = df.groupBy($"g")
      .agg(TopKByAgg.topKBy($"s", $"i", 3).as("tk")).collect()
    assert(out.head.getSeq[Row](1).map(r => (r.getDouble(0), r.getLong(1)))
      == Seq((2.0, 2L)))
  }

  test("SQL surface: topk_by resolves via GraftExtensions") {
    val sess = spark
    import sess.implicits._
    Seq((1, 0.5, 10L), (1, 0.9, 11L), (1, 0.9, 12L))
      .toDF("g", "s", "i").createOrReplaceTempView("tk_in")
    val out = spark.sql(
      "SELECT g, topk_by(s, i, 2) AS tk FROM tk_in GROUP BY g").collect()
    assert(out.head.getSeq[Row](1).map(r => (r.getDouble(0), r.getLong(1)))
      == Seq((0.9, 11L), (0.9, 12L)))
  }

  test("plan: partial ObjectHashAggregate before the exchange, no Window") {
    val plan = Similarity.annTopKAgg(tables).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_topk_by"), plan.take(2000))
    assert(!plan.contains("Window"), "top-k agg must not plan a rank window")
  }

  test("agrees with the rank-window brute-force query row for row") {
    val a = Similarity.annTopKAgg(tables)
      .select("q_id", "vec_id", "cos_sim", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = Similarity.annBruteForceTopK(tables)
      .select("q_id", "vec_id", "cos_sim", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b)
  }

  test("q_topn_agg agrees with the q_window_rank window row for row") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("o_custkey", "o_orderkey", "o_totalprice", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val a = rows(graft.operators.Relational.qTopNAgg(tables))
    val b = rows(graft.operators.Relational.qWindowRank(tables))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("heap never holds more than k entries") {
    val b = new TopKBuffer(3)
    (1L to 1000L).foreach(i => b.insert(i.toDouble, i))
    assert(b.size == 3)
    assert(b.sorted.toSeq == Seq((1000.0, 1000L), (999.0, 999L), (998.0, 998L)))
  }
}
