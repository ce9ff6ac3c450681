package graft.streaming

import graft.SparkSpec
import graft.operators.Multimodal

/** Pair #19: the stateless ingest-time integrity screen must equal
  * the batch audit row-for-row; and the batch `session_window` query
  * must equal the streaming one (pair #13 gated from both ends).
  */
class IntegrityStreamSpec extends SparkSpec {

  test("stream_integrity_audit equals the batch audit exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toSet
    val stream = rows(Streaming.streamIntegrityAudit(tables))
    val batch = rows(Multimodal.mmIntegrityAudit(tables))
    assert(stream == batch,
      s"audit drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    assert(batch.exists(_._6), "no corruption flagged — vacuous")
  }

  test("stream_mojibake equals the batch encoding screen exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val stream = rows(Streaming.streamMojibake(tables))
    val batch = rows(graft.operators.TextAnalysis.textMojibake(tables))
    assert(stream == batch,
      s"screen drift: ${(stream -- batch).take(3)} vs ${(batch -- stream).take(3)}")
    assert(batch.exists(_._5), "no corruption flagged — vacuous")
  }

  test("q_session_window_batch equals the streaming session_window agg") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = rows(Streaming.qSessionWindowBatch(tables))
    val stream = rows(Streaming.streamSessionWindow(tables))
    assert(batch == stream,
      s"session drift: ${(batch -- stream).take(3)} vs ${(stream -- batch).take(3)}")
    assert(batch.nonEmpty)
  }
}
