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

  test("append + watermark RETIRES closed weeks from the state store: " +
      "state rows ≈ open weeks, emissions ∪ state = the exact activity set") {
    import org.apache.spark.sql.functions._
    val run = Streaming.growthWeeksRetired(tables)
    // collected external datetime type depends on the session's java8
    // setting — normalize to Instant either way
    def inst(v: Any): java.time.Instant = v match {
      case t: java.sql.Timestamp => t.toInstant
      case i: java.time.Instant => i
    }
    implicit val instOrd: Ordering[java.time.Instant] =
      Ordering.by(_.toEpochMilli)
    // batch truth: the exact (user, week) activity set
    val uw = tables.events.select(col("user_id"),
        date_trunc("week", col("ts").cast("timestamp")).as("week"))
      .distinct().collect()
      .map(r => (r.getLong(0), inst(r.get(1)))).toSet
    val wLast = uw.map(_._2).max
    // a week W closes once the watermark (max week seen - 7d) reaches
    // it: W ≤ wLast - 7d (eviction fires at watermark ≥ group time)
    val horizon = java.time.Duration.ofDays(7)
    val closed = uw.filter { case (_, w) =>
      !w.isAfter(wLast.minus(horizon)) }
    val open = uw -- closed
    assert(closed.nonEmpty && open.nonEmpty, "degenerate week split")
    val emitted = run.emitted.collect()
      .map(r => (r.getLong(0), inst(r.get(1)))).toSet
    // emissions are EXACTLY the closed weeks (nothing early, nothing
    // dropped as late — the day-ordered feed never regresses)
    assert(emitted == closed,
      s"onlyEmitted=${(emitted -- closed).take(3)} " +
        s"missing=${(closed -- emitted).take(3)}")
    // the store ends holding ONLY the open groups — closed weeks
    // RETIRED, state bounded by the horizon, not the stream length
    assert(run.finalStateRows == open.size.toLong,
      s"state held ${run.finalStateRows} rows, open groups = ${open.size}")
    assert(run.finalStateRows < uw.size.toLong,
      "nothing retired: state = full history")
    // and the state trajectory never exceeded activity-to-date
    assert(run.stateRows.nonEmpty && run.stateRows.max <= uw.size.toLong)
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
