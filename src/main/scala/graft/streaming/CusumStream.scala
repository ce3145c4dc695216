package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift detection — the live form of
  * [[graft.operators.TimeSeries.cusum]] (q171), the monitor a pipeline
  * keeps on per-source quality/volume series BETWEEN index rebuilds:
  * batch CUSUM tells you a slice drifted yesterday, this one raises the
  * alarm in the microbatch where the drift crosses `h`.
  *
  * The CUSUM recursion is order-sensitive (s_t folds x_t in event-time
  * order), so correctness under out-of-order arrival needs the
  * [[ExactSessions]] watermark-buffer discipline: events BUFFER in state
  * until the event-time watermark passes them (no future event can sort
  * before the watermark), then fold through the recursion in
  * (ts, event_id) order — the identical total order the batch form's
  * window uses, so the parity spec can require the streamed alarm rows
  * row-for-row equal to the batch `alarm` filter. Events arriving
  * LATER than the lateness bound (ts already below the watermark) are
  * dropped and counted in `CusumState.droppedLate` — folding them on
  * arrival would reorder the recursion; the parity boundary is
  * enforced, not assumed. State per key is the
  * O(late-window) buffer + the two running numbers (p, min p) the
  * closed form needs — NOT the event history; a retired event is folded
  * once and dropped.
  *
  * Emission is append-mode with an event-time timeout (the
  * ExactSessions wake discipline) so tail events still fold when the
  * watermark advances past them with no new data for the key. */
object CusumStream {

  /** One observation (`ts` must be the watermark column). */
  final case class CusumEvent(user_id: Long, ts: Timestamp, event_id: Long,
    value: Double)

  /** One alarm: the statistic the moment it exceeded h. */
  final case class CusumAlarm(user_id: Long, ts: Timestamp, event_id: Long,
    s: Double)

  /** Per-key state: unretired events + the recursion's two numbers +
    * a count of events dropped for arriving past the watermark. */
  final case class CusumState(buffer: List[(Long, Long, Double)],
    p: Double, minP: Double, droppedLate: Long)

  import ExactSessions.{micros, toTs}

  def cusumExact(events: Dataset[CusumEvent], target: Double, slack: Double,
      h: Double, watermarkDelay: String): Dataset[CusumAlarm] = {
    import events.sparkSession.implicits._

    def fn(uid: Long, it: Iterator[CusumEvent],
        state: GroupState[CusumState]): Iterator[CusumAlarm] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(CusumState(Nil, 0.0, 0.0, 0L))
      // flatMapGroupsWithState does NOT pre-drop events older than the
      // watermark (ADVICE r16): an event later than the lateness bound
      // would land straight in `retire` and fold AFTER earlier-retired
      // events with larger ts — silently reordering the recursion and
      // breaking bit-parity with the batch window. Enforce the parity
      // boundary here: too-late events are DROPPED (and counted in
      // state.droppedLate), never folded out of order.
      val (fresh, late) = it
        .map(e => (micros(e.ts), e.event_id, e.value)).toList
        .partition(_._1 >= wmUs)
      val buffer = st.buffer ++ fresh
      // retire strictly-before-watermark events (a future event has
      // ts >= wm, so it can never sort before any retired one), fold in
      // the batch window's exact total order: (ts, event_id)
      val (retire, keep) = buffer.partition(_._1 < wmUs)
      var p = st.p
      var minP = st.minP
      val alarms = retire.sortBy(e => (e._1, e._2)).flatMap {
        case (tsUs, id, x) =>
          p += x - target - slack
          if (p < minP) minP = p
          val s = p - math.min(0.0, minP)
          if (s > h) Some(CusumAlarm(uid, toTs(tsUs), id, s)) else None
      }
      // the statistic persists for the key's lifetime (a drift monitor
      // never forgets p/minP — only buffered events retire), so state is
      // always updated, never removed
      state.update(CusumState(keep, p, minP, st.droppedLate + late.size))
      if (keep.nonEmpty) {
        val wakeMs = (keep.map(_._1).min / 1000L) + 1L
        state.setTimeoutTimestamp(
          math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
      }
      alarms.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
