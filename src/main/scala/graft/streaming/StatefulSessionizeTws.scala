package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import StatefulSessionize.{Ev, SessRow, SessState}

/** X31 — the SAME custom sessionization on Spark 4's NEW arbitrary-
  * state API, `transformWithState` (a `StatefulProcessor` with typed
  * state handles), next to the legacy `flatMapGroupsWithState`
  * implementation ([[StatefulSessionize]]) — two generations of the
  * extension point, one set of semantics, one oracle.
  *
  * Why this API matters at 100 TB: the new state store contract gives
  * typed NAMED states per key (value/list/map — so one processor can
  * carry several state shapes without packing them into one case
  * class), native TTL per state, and event timers
  * ([[StatefulProcessor.handleExpiredTimer]]) for closing idle
  * sessions WITHOUT waiting for the next event — the piece the legacy
  * API only approximates through `GroupStateTimeout`. The fold here
  * is deliberately byte-identical to the legacy operator (same
  * batch-sort, same state transitions, same emit discipline), so the
  * driver gate proves the two APIs agree — equivalence pair #28
  * shares `stream_sessionize`'s oracle verbatim.
  *
  * State is the O(1) open-session record per user, sharded by the
  * stream's key hashing; TTL is left NONE here because the bounded
  * drain closes everything — the production deploy sets a TTL equal
  * to its lateness horizon so abandoned keys age out of the store. */
object StatefulSessionizeTws {

  private final class SessProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Ev, SessRow] {

    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState]("open_session",
        Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessRow] = {
      // same in-batch event-time sort as the legacy operator: state
      // transitions are order-sensitive, batch arrival order is not
      // event order (bounded by batch size, not history)
      val evs = rows.toIndexedSeq.sortBy(_.us)
      var st =
        if (state.exists()) state.get()
        else SessState(Long.MinValue, 0L, 0L, 0.0)
      val out = IndexedSeq.newBuilder[SessRow]
      evs.foreach { e =>
        if (st.lastUs == Long.MinValue) {
          st = SessState(e.us, 1L, 1L, e.value)
        } else if (e.us - st.lastUs > gapUs) {
          out += SessRow(uid, st.sessionId, st.nEvents, st.sumValue)
          st = SessState(e.us, st.sessionId + 1, 1L, e.value)
        } else {
          st = SessState(e.us, st.sessionId, st.nEvents + 1,
            st.sumValue + e.value)
        }
      }
      if (st.lastUs != Long.MinValue) {
        state.update(st)
        out += SessRow(uid, st.sessionId, st.nEvents, st.sumValue)
      }
      out.result().iterator
    }
  }

  /** Sessionize via `transformWithState` — the [[StatefulSessionize]]
    * contract on the new API. */
  def sessionize(events: Dataset[Ev], gapUs: Long): Dataset[SessRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessProcessor(gapUs),
        TimeMode.None(), OutputMode.Update())
  }

  /** An event-time value row for the timer-driven closer. */
  final case class TimedEv(user_id: Long, ts: java.sql.Timestamp,
      value: Double)

  /** State for the timer-driven closer: the open session plus its
    * currently registered timer (so re-arming can delete the old one
    * — the store keys timers by expiry timestamp). */
  final case class TimedState(lastMs: Long, nEvents: Long,
      sumValue: Double, timerMs: Long)

  /** The piece the LEGACY API only approximates via
    * `GroupStateTimeout`: an idle-session closer driven by EVENT-TIME
    * TIMERS — each arrival re-arms a timer at `last event + gap`, and
    * when the WATERMARK passes it, [[StatefulProcessor.handleExpiredTimer]]
    * emits the closed session and clears the key's state — the
    * session closes because time passed, not because the next event
    * happened to arrive. This is how a 100 TB deploy keeps abandoned
    * keys out of the state store deterministically (watermark-driven,
    * replayable), rather than by wall-clock timeouts. */
  private final class IdleSessionCloser(gapMs: Long)
      extends StatefulProcessor[Long, TimedEv, SessRow] {

    @transient private var state: ValueState[TimedState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TimedState]("timed_session",
        Encoders.product[TimedState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[TimedEv],
        timerValues: TimerValues): Iterator[SessRow] = {
      val evs = rows.toIndexedSeq.sortBy(_.ts.getTime)
      var st =
        if (state.exists()) state.get()
        else TimedState(Long.MinValue, 0L, 0.0, Long.MinValue)
      evs.foreach { e =>
        val ms = e.ts.getTime
        st =
          if (st.lastMs == Long.MinValue)
            TimedState(ms, 1L, e.value, st.timerMs)
          else TimedState(ms, st.nEvents + 1, st.sumValue + e.value,
            st.timerMs)
      }
      if (st.lastMs != Long.MinValue) {
        // re-arm: one live timer per key, at last-event + gap
        if (st.timerMs != Long.MinValue) getHandle.deleteTimer(st.timerMs)
        val expiry = st.lastMs + gapMs
        getHandle.registerTimer(expiry)
        state.update(st.copy(timerMs = expiry))
      }
      Iterator.empty // closed sessions are emitted by the TIMER only
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessRow] = {
      val st = state.get()
      state.clear()
      Iterator.single(SessRow(uid, 1L, st.nEvents, st.sumValue))
    }
  }

  /** Timer-closed sessions: rows arrive with an event-time watermark,
    * sessions are EMITTED (and their state dropped) only when the
    * watermark passes `last event + gapMs`. */
  def sessionizeWithTimers(events: Dataset[TimedEv],
      gapMs: Long): Dataset[SessRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new IdleSessionCloser(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
