package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis

/** The native Misra–Gries frequent-items aggregate (SURVEY §2 F2):
  * bounded state, the no-false-negative guarantee above n/(m+1), the
  * undercount bound, and the sketch→exact-verify query equalling the
  * unbounded GROUP BY reference — all through real partial→final
  * merges (every run is repartitioned).
  */
class MisraGriesSpec extends SparkSpec {

  /** Zipf-ish skewed stream: key k_i appears ⌊N/i⌋ times, i = 1..D,
    * deterministically interleaved (no adjacent runs) so partial
    * buffers across partitions see mixed key order. */
  private def skewedStream(big: Int, distinct: Int): Seq[String] =
    (1 to distinct).flatMap(i => Seq.fill(big / i)(s"k$i"))
      .zipWithIndex
      .sortBy { case (_, ix) => (ix * 2654435761L) % 1000003 }
      .map(_._1)

  private def sketch(stream: Seq[String], m: Int,
      partitions: Int = 7): (Long, Map[String, Long]) = {
    val sess = spark
    import sess.implicits._
    val row = stream.toDF("w")
      .repartition(partitions) // forces partial buffers + merge()
      .agg(MisraGriesAgg.misraGries($"w", m).as("mg"))
      .selectExpr("mg.n", "mg.items")
      .collect().head
    (row.getLong(0),
      row.getSeq[Row](1).map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("no key above n/(m+1) is lost, estimates undercount within bound") {
    val stream = skewedStream(600, 80) // n≈2900, many keys, heavy head
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    for (m <- Seq(8, 16); p <- Seq(1, 7)) {
      val (sn, est) = sketch(stream, m, p)
      assert(sn == n)
      assert(est.size <= m, s"capacity violated: ${est.size} > $m")
      val bound = n / (m + 1)
      truth.foreach { case (k, c) =>
        if (c > bound)
          assert(est.contains(k), s"m=$m p=$p lost heavy key $k (count $c > $bound)")
        est.get(k).foreach { e =>
          assert(e <= c, s"overcount of $k: est $e > true $c")
          assert(c - e <= bound, s"undercount of $k beyond bound: $c - $e > $bound")
        }
      }
    }
  }

  test("merge path agrees with the single-partition run on the survivor guarantee") {
    val stream = skewedStream(400, 50)
    val n = stream.size.toLong
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val heavy = truth.filter(_._2 > n / 13).keySet
    val (_, one) = sketch(stream, 12, 1)
    val (_, many) = sketch(stream, 12, 13)
    // survivor SETS can differ between merge orders (MG is not
    // order-invariant below the bound), but the guarantee may not
    assert(heavy.subsetOf(one.keySet) && heavy.subsetOf(many.keySet))
  }

  test("empty input yields n=0 and an empty summary") {
    val sess = spark
    import sess.implicits._
    val (n, est) = {
      val row = Seq.empty[String].toDF("w")
        .agg(MisraGriesAgg.misraGries($"w", 8).as("mg"))
        .selectExpr("mg.n", "mg.items").collect().head
      (row.getLong(0), row.getSeq[Row](1))
    }
    assert(n == 0L && est.isEmpty)
  }

  test("text_heavy_hitters equals the unbounded GROUP BY reference") {
    val t = Tables(spark, sfDir)
    val got = TextAnalysis.textHeavyHitters(t)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val toks = t.documents
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    val expect = toks.groupBy(col("token")).count()
      .filter(col("count") * 40 >= n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "threshold should select a non-empty head at sf0.001")
  }

  test("SQL surface: misra_gries resolves via GraftExtensions") {
    val sess = spark
    import sess.implicits._
    Seq("a", "a", "a", "b", "c").toDF("w").createOrReplaceTempView("mg_in")
    val row = spark.sql(
      "SELECT misra_gries(w, 2) AS mg FROM mg_in").selectExpr("mg.n", "mg.items")
      .collect().head
    assert(row.getLong(0) == 5L)
    val items = row.getSeq[Row](1).map(r => (r.getString(0), r.getLong(1)))
    assert(items.map(_._1).contains("a")) // 3 > n/(m+1) = 5/3
  }

  test("sketch plan is ObjectHashAggregate with a partial stage before the exchange") {
    val t = Tables(spark, sfDir)
    val plan = TextAnalysis.textHeavyHitters(t).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
  }
}
