package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for `stream_session_window` — the NATIVE merging-window
  * sessionizer: stream == batch, and the half-open window boundary
  * the oracle's `>=` break encodes.
  */
class SessionWindowSpec extends SparkSpec {

  test("native session windows: streaming drain equals the batch session_window agg") {
    val t = tables
    val stream = Streaming.streamSessionWindow(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = t.events
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start").cast("timestamp"))
          .as("session_start_us"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(stream == batch,
      s"stream/batch drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    assert(batch.nonEmpty)
  }

  test("an event at exactly last+gap still MERGES (closed boundary, pins the > oracle)") {
    // the semantic the oracle's strict `>` break encodes: Spark's
    // session_window merges an arrival at exactly last_ts + gap and
    // only a strictly later one opens a fresh session
    import spark.implicits._
    val gapUs = 1800L * 1000 * 1000
    def sessions(deltaUs: Long): Long = {
      val base = Timestamp.valueOf("2024-01-01 00:00:00")
      val rows = Seq(
        (1L, new Timestamp(base.getTime)),
        (1L, new Timestamp(base.getTime + deltaUs / 1000)))
      rows.toDF("user_id", "ts")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .count()
    }
    assert(sessions(gapUs) == 1L, "event at exactly last+gap must merge")
    assert(sessions(gapUs + 1000) == 2L,
      "event strictly past the gap must open a new session")
  }
}
