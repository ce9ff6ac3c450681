package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** X3 — custom stateful sessionization via `flatMapGroupsWithState`
  * (SURVEY.md §2.7): the canonical "state Spark's built-ins can't
  * express" operator — per-user session accumulation with a gap
  * threshold, carrying (last-seen time, open-session aggregate) across
  * micro-batches.
  *
  * State is keyed by user, so it shards across executors with the
  * stream's hash partitioning; each group's state is O(1) (the open
  * session only), which is what keeps 100 TB of history out of the
  * state store — the watermark/timeout policy of a production deploy
  * plugs into the same hook.
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, us: Long, value: Double)

  /** Open-session state carried across batches. */
  final case class SessState(
      lastUs: Long, sessionId: Long, nEvents: Long, sumValue: Double)

  final case class SessRow(
      user_id: Long, session_id: Long, n_events: Long, sum_value: Double)

  /** Sessionize a (possibly streaming) typed event Dataset; a gap
    * > `gapUs` starts a new session. Emits every session touched in
    * the batch — closed sessions are final, the open session's row is
    * re-emitted (updated) if a later batch extends it.
    */
  def sessionize(events: Dataset[Ev], gapUs: Long): Dataset[SessRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[SessState]) =>
          // within a batch the group's events are not ordered: sort by
          // event time (bounded by batch size, not history)
          val evs = it.toIndexedSeq.sortBy(_.us)
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L, 0.0))
          val out = IndexedSeq.newBuilder[SessRow]
          evs.foreach { e =>
            if (st.lastUs == Long.MinValue) {
              st = SessState(e.us, 1L, 1L, e.value)
            } else if (e.us - st.lastUs > gapUs) {
              out += SessRow(uid, st.sessionId, st.nEvents, st.sumValue) // session closed
              st = SessState(e.us, st.sessionId + 1, 1L, e.value)
            } else {
              st = SessState(e.us, st.sessionId, st.nEvents + 1, st.sumValue + e.value)
            }
          }
          if (st.lastUs != Long.MinValue) {
            state.update(st)
            out += SessRow(uid, st.sessionId, st.nEvents, st.sumValue) // open session (update)
          }
          out.result().iterator
      }
  }
}
