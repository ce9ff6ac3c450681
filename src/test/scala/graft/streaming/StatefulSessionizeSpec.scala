package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational

class StatefulSessionizeSpec extends SparkSpec {
  import StatefulSessionize._

  test("stateful sessionize over a stream matches the batch operator") {
    import spark.implicits._
    val t = tables

    // batch reference: (user_id, session_id) rows from the window-based
    // relational operator
    val batch = Relational.qSessionize(t)
      .select(col("user_id"), col("session_id"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // streaming input: same events via an in-memory typed stream (one
    // availableNow batch — state still exercises the cross-batch path)
    val evs = t.events
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        col("value"))
      .as[Ev]

    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    input.addData(evs.collect().toIndexedSeq)

    val q = sessionize(input.toDS(), gapUs = 1800L * 1000 * 1000)
      .writeStream.outputMode("update").format("memory")
      .queryName("sessionize_test").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sessionize_test")
      .select(col("user_id"), col("session_id"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(streamed == batch,
      s"stateful != batch: onlyStream=${(streamed -- batch).take(5)} onlyBatch=${(batch -- streamed).take(5)}")
  }

  test("state carries sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = sessionize(input.toDS(), gapUs = 1000L)
      .writeStream.outputMode("update").format("memory")
      .queryName("sessionize_xbatch").start()

    input.addData(Ev(1L, 100L, 1.0)) // batch 1: open session
    q.processAllAvailable()
    input.addData(Ev(1L, 500L, 2.0)) // batch 2: same session (gap 400 < 1000)
    q.processAllAvailable()
    input.addData(Ev(1L, 5000L, 4.0)) // batch 3: gap 4500 → new session
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessionize_xbatch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // latest state per session: session 1 has 2 events (sum 3.0),
    // session 2 has 1 event (sum 4.0)
    val latest = rows.groupBy(x => (x._1, x._2)).map { case (_, v) => v.last }.toSet
    assert(latest == Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0)), s"got $latest")
  }
}
