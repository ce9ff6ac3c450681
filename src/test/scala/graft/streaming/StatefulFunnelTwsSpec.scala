package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X32 — the transformWithState funnel: the two state-API generations
  * must agree bit for bit (including across micro-batch boundaries,
  * where the state handles actually differ), the native TTL must
  * really evict idle keys, and the event-timer abandonment closer
  * must emit because the WATERMARK passed, not because an event
  * arrived. */
class StatefulFunnelTwsSpec extends SparkSpec {
  import StatefulFunnel.Ev

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Drain feeds through either implementation; final row per user. */
  private def drain(feeds: Seq[Seq[Ev]], name: String,
      tws: Boolean): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(): Set[(Long, Long, Long, Long)] = {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
      val out =
        if (tws) StatefulFunnelTws.funnel(input.toDS())
        else StatefulFunnel.funnel(input.toDS())
      val q = out.toDF().writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      feeds.foreach { batch => input.addData(batch); q.processAllAvailable() }
      q.stop()
      spark.table(name)
        .groupBy(col("user_id"))
        .agg(max(col("v_us")).as("v"), max(col("c_us")).as("c"),
          max(col("p_us")).as("p"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    if (tws) withRocksDb(run()) else run()
  }

  test("transformWithState == flatMapGroupsWithState across micro-batches") {
    // stages arriving in DIFFERENT batches: progress must carry over;
    // out-of-order regressions must be ignored identically
    val feeds = Seq(
      Seq(Ev(1L, 100L, "view"), Ev(2L, 50L, "click")), // 2: click w/o view
      Seq(Ev(1L, 200L, "click"), Ev(2L, 60L, "view")),
      Seq(Ev(1L, 300L, "purchase"), Ev(2L, 55L, "click"), // 55 < 60: reject
        Ev(3L, 10L, "purchase"))) // purchase w/o click: never counts
    val tws = drain(feeds, "tws_funnel_x", tws = true)
    val legacy = drain(feeds, "legacy_funnel_x", tws = false)
    assert(tws == legacy,
      s"onlyTws=${(tws -- legacy).take(5)} onlyLegacy=${(legacy -- tws).take(5)}")
    // non-degenerate: user 1 completed ACROSS batches, user 2 never
    // clicked validly after the view, user 3 has nothing
    assert(tws.contains((1L, 100L, 200L, 300L)), s"$tws")
    assert(tws.contains((2L, 60L, -1L, -1L)), s"$tws")
    assert(tws.contains((3L, -1L, -1L, -1L)), s"$tws")
  }

  test("TWS funnel over the full corpus equals the legacy funnel") {
    import spark.implicits._
    val evs = tables.events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_type"))
      .as[Ev].collect().toIndexedSeq
    val tws = drain(Seq(evs), "tws_funnel_full", tws = true)
    val legacy = drain(Seq(evs), "legacy_funnel_full", tws = false)
    assert(tws == legacy)
    assert(tws.nonEmpty)
  }

  test("native TTL evicts idle keys; a long TTL keeps them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ProcessingTime mode triggers batches CONTINUOUSLY (the TTL/timer
    // clock), so processAllAvailable never settles — poll the sink for
    // the expected emission count instead, and pace the trigger
    def waitFor(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!cond) {
        assert(System.nanoTime() < deadline, "sink never caught up")
        Thread.sleep(100)
      }
    }
    def run(ttlMs: Long, name: String,
        sleepMs: Long): Set[(Long, Long, Long, Long)] = withRocksDb {
      val input =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
      val q = StatefulFunnelTws
        .funnelWithTtl(input.toDS(), java.time.Duration.ofMillis(ttlMs))
        .toDF().writeStream.outputMode("update").format("memory")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
        .queryName(name).start()
      // keys with no input emit nothing, so each addData lands exactly
      // one more row for user 1 in the sink
      input.addData(Seq(Ev(1L, 100L, "view")))
      waitFor(spark.table(name).count() >= 1)
      Thread.sleep(sleepMs)
      input.addData(Seq(Ev(1L, 200L, "click")))
      waitFor(spark.table(name).count() >= 2)
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    // TTL far beyond the run: the view survives and the click lands
    assert(run(600000L, "ttl_long", sleepMs = 200L)
      .contains((1L, 100L, 200L, -1L)))
    // TTL of 50ms with a 2s idle gap: the runtime EVICTED the view
    // state, so the click arrives against a blank key and is refused
    // (no view yet) — exactly the abandoned-funnel-costs-nothing deal
    assert(run(50L, "ttl_short", sleepMs = 2000L)
      .contains((1L, -1L, -1L, -1L)))
  }

  test("event-time timers emit the abandoned stage when the watermark passes") {
    import spark.implicits._
    import StatefulFunnelTws.TimedFunnelEv
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[TimedFunnelEv]
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val q = StatefulFunnelTws.abandonment(input.toDS(), gapMs = 30000L)
        .toDF().writeStream.outputMode("append").format("memory")
        .queryName("funnel_abandon").start()
      // user 1 stalls at click; user 4 completes immediately
      input.addData(Seq(TimedFunnelEv(1L, ts(10), "view"),
        TimedFunnelEv(1L, ts(20), "click"),
        TimedFunnelEv(4L, ts(10), "view"), TimedFunnelEv(4L, ts(11), "click"),
        TimedFunnelEv(4L, ts(12), "purchase")))
      q.processAllAvailable()
      val early = spark.table("funnel_abandon").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(early == Set((4L, "purchase")),
        s"only the completed user may emit before the watermark: $early")
      // a far-future event on another key pushes the watermark past
      // user 1's last+gap -> the TIMER emits the stalled stage
      input.addData(Seq(TimedFunnelEv(2L, ts(1000), "view")))
      q.processAllAvailable()
      input.addData(Seq(TimedFunnelEv(2L, ts(2000), "click")))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("funnel_abandon").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows.contains((1L, "click")),
        s"timer did not surface the abandonment: $rows")
      // user 2 keeps progressing: its timer never expired
      assert(!rows.exists(_._1 == 2L), s"$rows")
    }
  }
}
