package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Pair #20: the continuous keyed-state heavy-hitters readout must
  * equal the batch sketch→exact-verify operator token-for-token (both
  * share the plain GROUP BY/HAVING oracle).
  */
class HeavyHittersStreamSpec extends SparkSpec {

  test("stream_epoch_plan equals the batch planner row-for-row") {
    val stream = Streaming.streamEpochPlan(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val batch = TextAnalysis.corpusEpochPlan(tables).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(stream == batch,
      s"plan drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    assert(batch.nonEmpty)
  }

  test("stream_holt_forecast equals the batch forecaster row-for-row") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val stream = rows(Streaming.streamHoltForecast(tables))
    val batch = rows(graft.operators.EventAnalytics.eventsHoltForecast(tables))
    assert(stream == batch,
      s"holt drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    assert(batch.nonEmpty)
  }

  test("stream_heavy_hitters equals the batch sketch->verify operator exactly") {
    val stream = Streaming.streamHeavyHitters(tables).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = TextAnalysis.textHeavyHitters(tables).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(stream == batch,
      s"drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    assert(batch.nonEmpty)
  }
}
