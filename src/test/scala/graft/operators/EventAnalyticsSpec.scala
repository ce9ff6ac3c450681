package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards for the event-analytics fan-out hazards. */
class EventAnalyticsSpec extends SparkSpec {

  test("cooccur cap bounds per-user pair fan-out") {
    val cap = 3
    val items = EventAnalytics.cappedUserItems(tables, cap)
    val maxPerUser = items.groupBy(col("user_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxPerUser <= cap,
      s"cap $cap leaked: a user kept $maxPerUser items")
    // the self-join therefore emits ≤ cap·(cap−1)/2 pairs per user
    val pairsPerUser = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.user_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(pairsPerUser <= cap.toLong * (cap - 1) / 2)
  }

  test("cooccur cap is exact below the threshold") {
    // every sf0.001 user holds far fewer distinct items than the
    // default cap, so the capped result must equal the uncapped one
    val capped = EventAnalytics.eventsRecommendCooccur(tables)
    val uncapped = EventAnalytics.eventsRecommendCooccur(tables,
      maxItemsPerUser = Int.MaxValue)
    assert(capped.exceptAll(uncapped).isEmpty &&
      uncapped.exceptAll(capped).isEmpty)
  }
}
