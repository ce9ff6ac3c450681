package graft.streaming

import graft.SparkSpec
import graft.operators.EventAnalytics

/** Pair #15: the one-agg streaming DAU/WAU fold must equal the batch
  * board row-for-row.
  */
class ActiveUsersStreamSpec extends SparkSpec {

  test("stream_active_users equals the batch DAU/WAU board exactly") {
    val stream = Streaming.streamActiveUsers(tables).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventAnalytics.eventsActiveUsers(tables).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch,
      s"board drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    assert(batch.nonEmpty)
    // WAU must dominate DAU everywhere — the windows really widen
    assert(batch.forall { case (_, dau, wau) => wau >= dau })
  }
}
