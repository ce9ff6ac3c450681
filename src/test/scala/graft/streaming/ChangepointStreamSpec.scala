package graft.streaming

import graft.SparkSpec
import graft.operators.EventAnalytics

/** Pair #17: the hourly streaming state folded through the shared
  * CUSUM scoring stage must equal the batch monitor exactly.
  */
class ChangepointStreamSpec extends SparkSpec {

  test("stream_changepoint equals the batch CUSUM monitor exactly") {
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))
    }
    val stream = row(Streaming.streamChangepoint(tables))
    val batch = row(EventAnalytics.eventsChangepoint(tables))
    assert(stream == batch, s"monitor drift: $stream vs $batch")
    // the statistic discriminates on the spec corpus
    assert(batch._4 > 0, "flat series — max |CUSUM| is zero")
  }
}
