package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import StatefulFunnel.{Ev, FunnelRow, FunnelState}

/** X32 — the conversion funnel on Spark 4's NEW arbitrary-state API,
  * `transformWithState` (typed named state handles, native TTL, event
  * timers), next to the legacy `flatMapGroupsWithState` operator
  * ([[StatefulFunnel]]) — the second operator family carried across
  * both generations of the extension point (the sessionizer pair
  * [[StatefulSessionizeTws]] was the first), one set of semantics,
  * one oracle.
  *
  * The fold is deliberately byte-identical to the legacy funnel (same
  * in-batch event-time sort, same write-once stage transitions, same
  * emit discipline), so the spec proves the two APIs agree across
  * engineered micro-batch boundaries and `stream_tws_funnel` shares
  * `stream_funnel`'s DuckDB oracle verbatim.
  *
  * State is the O(1) three-timestamp record per user, sharded by the
  * stream's key hashing. The batch-drain entry point leaves TTL NONE
  * (a bounded replay touches every key); [[funnelWithTtl]] is the
  * live-deploy shape — per-state native TTL ages abandoned keys out
  * of the store without a timer per key, the knob the legacy API
  * simply does not have (`GroupStateTimeout` can only fire a
  * callback; TTL EVICTS) — and [[abandonment]] is the event-timer
  * readout: emit the stage a user STOPPED at once the watermark says
  * no further progress can arrive.
  */
object StatefulFunnelTws {

  private final class FunnelProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Ev, FunnelRow] {

    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel_stages",
        Encoders.product[FunnelState], ttl)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[FunnelRow] = {
      var st =
        if (state.exists()) state.get()
        else FunnelState(-1L, -1L, -1L)
      // in-batch events are unordered; sort by time so the write-once
      // scan sees stages in event-time order — the legacy fold verbatim
      rows.toIndexedSeq.sortBy(_.us).foreach { e =>
        e.event_type match {
          case "view" if st.vUs < 0 =>
            st = st.copy(vUs = e.us)
          case "click" if st.cUs < 0 && st.vUs >= 0 && e.us > st.vUs =>
            st = st.copy(cUs = e.us)
          case "purchase" if st.pUs < 0 && st.cUs >= 0 && e.us > st.cUs =>
            st = st.copy(pUs = e.us)
          case _ => ()
        }
      }
      state.update(st)
      Iterator.single(FunnelRow(uid, st.vUs, st.cUs, st.pUs))
    }
  }

  /** The [[StatefulFunnel.funnel]] contract on the new API. */
  def funnel(events: Dataset[Ev]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(TTLConfig.NONE),
        TimeMode.None(), OutputMode.Update())
  }

  /** The live-deploy variant: identical fold, but the state handle
    * carries a NATIVE TTL — a key idle past `ttl` is evicted from the
    * store by the runtime itself (processing-time clock), so an
    * abandoned funnel costs nothing forever. Requires
    * `TimeMode.ProcessingTime` (the TTL clock). */
  def funnelWithTtl(events: Dataset[Ev],
      ttl: java.time.Duration): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** An event-time funnel row for the abandonment closer. */
  final case class TimedFunnelEv(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  /** (stage reached, last progress ms, armed timer ms). */
  final case class AbandonState(stage: Int, lastMs: Long, timerMs: Long)

  final case class AbandonRow(user_id: Long, stage_reached: String)

  private val StageNames = Array("none", "view", "click", "purchase")

  /** The piece the LEGACY API only approximates: ABANDONMENT driven by
    * EVENT-TIME TIMERS — each stage advance re-arms a timer at
    * `last progress + gap`; when the WATERMARK passes it,
    * [[StatefulProcessor.handleExpiredTimer]] emits the stage the
    * user stopped at and clears the key — the funnel-analytics row
    * ("how many users stall at click?") exists because time passed,
    * not because a later event happened to arrive. Users who complete
    * the funnel emit immediately and never arm a timer. */
  private final class AbandonmentProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedFunnelEv, AbandonRow] {

    @transient private var state: ValueState[AbandonState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AbandonState]("funnel_abandon",
        Encoders.product[AbandonState], TTLConfig.NONE)

    private def next(stage: Int): String = StageNames(stage + 1)

    override def handleInputRows(uid: Long, rows: Iterator[TimedFunnelEv],
        timerValues: TimerValues): Iterator[AbandonRow] = {
      var st =
        if (state.exists()) state.get()
        else AbandonState(0, Long.MinValue, Long.MinValue)
      var completed = false
      rows.toIndexedSeq.sortBy(_.ts.getTime).foreach { e =>
        if (!completed && e.event_type == next(st.stage)) {
          st = AbandonState(st.stage + 1, e.ts.getTime, st.timerMs)
          if (st.stage == 3) completed = true
        }
      }
      if (completed) {
        // full conversion: emit now, drop state and any armed timer
        if (st.timerMs != Long.MinValue) getHandle.deleteTimer(st.timerMs)
        state.clear()
        Iterator.single(AbandonRow(uid, "purchase"))
      } else if (st.lastMs != Long.MinValue) {
        // re-arm: one live timer per key, at last progress + gap
        if (st.timerMs != Long.MinValue) getHandle.deleteTimer(st.timerMs)
        val expiry = st.lastMs + gapMs
        getHandle.registerTimer(expiry)
        state.update(st.copy(timerMs = expiry))
        Iterator.empty
      } else Iterator.empty // no stage progress yet: nothing to track
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[AbandonRow] = {
      val st = state.get()
      state.clear()
      Iterator.single(AbandonRow(uid, StageNames(st.stage)))
    }
  }

  /** Abandonment rows: users emit `purchase` on completion, or the
    * stage they stalled at once the watermark passes
    * `last progress + gapMs`. */
  def abandonment(events: Dataset[TimedFunnelEv],
      gapMs: Long): Dataset[AbandonRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new AbandonmentProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
