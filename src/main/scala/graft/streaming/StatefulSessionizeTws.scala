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
}
