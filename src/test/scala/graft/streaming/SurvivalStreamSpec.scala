package graft.streaming

import graft.SparkSpec
import graft.operators.EventAnalytics

/** Pair #18: per-user (min, max) day extents as streaming state,
  * folded through the shared KM stage, must equal the batch curve.
  */
class SurvivalStreamSpec extends SparkSpec {

  test("stream_survival equals the batch Kaplan-Meier life table") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val stream = rows(Streaming.streamSurvival(tables))
    val batch = rows(EventAnalytics.eventsSurvival(tables))
    assert(stream == batch, s"curve drift: $stream vs $batch")
    assert(batch.nonEmpty)
    // survival is monotone non-increasing along the life table
    val s = batch.toSeq.sortBy(_._1).map(_._5)
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
  }
}
