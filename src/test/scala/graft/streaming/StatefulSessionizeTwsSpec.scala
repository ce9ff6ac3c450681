package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X31 — the transformWithState sessionizer: two generations of the
  * arbitrary-state API must agree bit for bit, including across
  * micro-batch boundaries (where the state handles actually differ). */
class StatefulSessionizeTwsSpec extends SparkSpec {
  import StatefulSessionize.{Ev, SessRow}

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  private def drainTws(feeds: Seq[Seq[Ev]], gapUs: Long,
      name: String): Set[(Long, Long, Long, Double)] = withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StatefulSessionizeTws.sessionize(input.toDS(), gapUs)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    feeds.foreach { batch => input.addData(batch); q.processAllAvailable() }
    q.stop()
    // last update per (user, session) wins — same readout as the query
    spark.table(name)
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(struct(col("n_events"), col("sum_value"))).as("fin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getStruct(2).getLong(0),
        math.round(r.getStruct(2).getDouble(1) * 100) / 100.0))
      .toSet
  }

  private def drainLegacy(feeds: Seq[Seq[Ev]], gapUs: Long,
      name: String): Set[(Long, Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = StatefulSessionize.sessionize(input.toDS(), gapUs)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    feeds.foreach { batch => input.addData(batch); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(struct(col("n_events"), col("sum_value"))).as("fin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getStruct(2).getLong(0),
        math.round(r.getStruct(2).getDouble(1) * 100) / 100.0))
      .toSet
  }

  test("transformWithState == flatMapGroupsWithState across micro-batches") {
    // three batches engineered to exercise every state transition at
    // the BATCH BOUNDARY: extend-open, close-then-open, brand-new key
    val feeds = Seq(
      Seq(Ev(1L, 100L, 1.0), Ev(1L, 200L, 2.0), Ev(2L, 50L, 5.0)),
      Seq(Ev(1L, 900L, 3.0), // within gap: extends user 1's session
        Ev(2L, 99999L, 7.0)), // far out: closes user 2's, opens next
      Seq(Ev(3L, 1L, 9.0))) // new key appears late
    val gap = 1000L
    val tws = drainTws(feeds, gap, "tws_xbatch")
    val legacy = drainLegacy(feeds, gap, "legacy_xbatch")
    assert(tws == legacy,
      s"onlyTws=${(tws -- legacy).take(5)} onlyLegacy=${(legacy -- tws).take(5)}")
    // non-degenerate: a session genuinely crossed a batch boundary and
    // a session genuinely closed
    assert(tws.exists { case (u, s, n, _) => u == 1L && s == 1L && n == 3L },
      s"cross-batch extension missing: $tws")
    assert(tws.exists { case (u, s, _, _) => u == 2L && s == 2L },
      s"boundary close/open missing: $tws")
  }

  test("TWS sessionizer over the full corpus equals the batch window operator") {
    import spark.implicits._
    val t = tables
    val batch = graft.operators.Relational.qSessionize(t)
      .select(col("user_id"), col("session_id"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val evs = t.events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .as[Ev].collect().toIndexedSeq
    val tws = drainTws(Seq(evs), 1800L * 1000 * 1000, "tws_full")
    assert(tws == batch,
      s"onlyTws=${(tws -- batch).take(5)} onlyBatch=${(batch -- tws).take(5)}")
  }
  test("event-time timers close idle sessions when the watermark passes") {
    import spark.implicits._
    import StatefulSessionizeTws.TimedEv
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[TimedEv]
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val q = StatefulSessionizeTws
        .sessionizeWithTimers(input.toDS(), gapMs = 30000L)
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_timers").start()
      // batch 1: user 1 has two events; nothing may emit yet (the
      // watermark has not passed last + gap)
      input.addData(Seq(TimedEv(1L, ts(10), 1.0), TimedEv(1L, ts(20), 2.0)))
      q.processAllAvailable()
      assert(spark.table("tws_timers").count() == 0,
        "session closed before the watermark allowed it")
      // batch 2: a far-future event on ANOTHER key advances the
      // watermark past user 1's last+gap -> the TIMER must close it
      input.addData(Seq(TimedEv(2L, ts(1000), 5.0)))
      q.processAllAvailable()
      // one more empty-ish advance so the expired timer's emission
      // lands in the sink
      input.addData(Seq(TimedEv(2L, ts(2000), 1.0)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_timers").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains((1L, 2L, 3.0)),
        s"timer did not close user 1's idle session: ${rows.mkString(",")}")
      // user 2's session stays OPEN (watermark never passed its gap)
      assert(!rows.exists(_._1 == 2L),
        s"user 2 closed without its timer expiring: ${rows.mkString(",")}")
    }
  }

}
