package graft.streaming

import graft.SparkSpec
import graft.operators.EventAnalytics

/** Pair #16: the per-(user, minute) streaming state folded through
  * the shared scoring stage must equal the batch screen row-for-row —
  * the decomposability claim (burst = max over minutes, distinct
  * triples = sum of per-minute distincts, span = minute extents)
  * proven end to end, and the injected ground truth must be recovered
  * by BOTH paths.
  */
class BotDetectStreamSpec extends SparkSpec {

  test("stream_bot_detect equals the batch screen exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    val stream = rows(Streaming.streamBotDetect(tables))
    val batch = rows(EventAnalytics.eventsBotDetect(tables))
    assert(stream == batch,
      s"screen drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    // both paths recover exactly the injected bot users (md5 nibble 1)
    val injected = tables.events.select("user_id").distinct().collect()
      .map(_.getLong(0))
      .filter(u => java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.startsWith("1")).toSet
    val flagged = stream.filter(_._7).map(_._1)
    assert(flagged == injected,
      s"flag drift: ${(flagged -- injected).take(3)} vs ${(injected -- flagged).take(3)}")
    assert(injected.nonEmpty, "no injected bots at this SF — vacuous")
  }
}
