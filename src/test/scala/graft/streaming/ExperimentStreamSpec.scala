package graft.streaming

import graft.SparkSpec
import graft.operators.EventAnalytics

/** Pairs #21/#22: the live experimentation guards must equal their
  * batch estimators bit-for-bit — the SRM monitor through streaming
  * dedup + keyed count state, and the DiD panel through the (Σq, n)
  * cell state whose drained integer recovery IS the ExactAgg mean.
  */
class ExperimentStreamSpec extends SparkSpec {

  test("stream_srm equals the batch guard bit-for-bit") {
    val s = Streaming.streamSrm(tables).collect()(0)
    val b = EventAnalytics.eventsSrm(tables).collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getDouble(2), s.getBoolean(3)) ==
      ((b.getLong(0), b.getLong(1), b.getDouble(2), b.getBoolean(3))))
    assert(s.getLong(0) + s.getLong(1) > 0)
  }

  test("stream_did cell-state recovery equals the batch estimator bit-for-bit") {
    val s = Streaming.streamDid(tables).collect()(0)
    val b = EventAnalytics.eventsDid(tables).collect()(0)
    (0 to 3).foreach(i => assert(s.getLong(i) == b.getLong(i), s"cell n $i"))
    (4 to 8).foreach(i => assert(s.getDouble(i) == b.getDouble(i), s"col $i"))
  }
}
