package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** X5 — stateful streaming conversion funnel via
  * `flatMapGroupsWithState` (SURVEY.md §2.7): per-user ordered
  * view→click→purchase progress carried across micro-batches — the
  * streaming twin of [[graft.operators.EventAnalytics.eventsFunnel]].
  *
  * State is keyed by user and O(1) (three stage timestamps), so it
  * shards with the stream's hash partitioning and never grows with
  * history. Each stage timestamp is write-once: the first view fixes
  * `vUs`, the first click strictly after it fixes `cUs`, the first
  * purchase strictly after that fixes `pUs` — processing a batch's
  * events in time order makes this sequential scan equal to the batch
  * conditional-min semantics. Like the sessionizer, cross-batch
  * correctness assumes batches arrive in time order (the availableNow
  * backfill drain satisfies this; a live deploy adds a watermark).
  */
object StatefulFunnel {

  final case class Ev(user_id: Long, us: Long, event_type: String)

  /** Write-once stage timestamps; -1 = stage not reached. */
  final case class FunnelState(vUs: Long, cUs: Long, pUs: Long)

  final case class FunnelRow(user_id: Long, v_us: Long, c_us: Long, p_us: Long)

  def funnel(events: Dataset[Ev]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          // in-batch events are unordered; sort by time so the
          // write-once scan sees stages in event-time order
          it.toIndexedSeq.sortBy(_.us).foreach { e =>
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
}
