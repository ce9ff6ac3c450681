package graft.streaming

import graft.SparkSpec

/** X34 — stream/batch equivalence pair #30: the weekly growth
  * decomposition maintained as one keyed streaming aggregation must
  * equal the batch operator row for row (they share the DuckDB oracle
  * at the driver gate; this pins the equality locally too). */
class GrowthAccountingStreamSpec extends SparkSpec {

  test("stream_ols_trend == events_ols_trend") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val stream = rows(Streaming.streamOlsTrend(tables))
    val batch = rows(graft.operators.EventAnalytics.eventsOlsTrend(tables))
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("stream_growth_accounting == events_growth_accounting") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val stream = rows(Streaming.streamGrowthAccounting(tables))
    val batch =
      rows(graft.operators.EventAnalytics.eventsGrowthAccounting(tables))
    assert(stream == batch,
      s"onlyStream=${(stream -- batch).take(3)} onlyBatch=${(batch -- stream).take(3)}")
    assert(stream.nonEmpty)
  }
}
