package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forward fill (the q59 batch operator as a live stream):
  * carry each key's latest non-null measurement forward onto subsequent
  * events — sensor gap patching at ingest time.
  *
  * Ordering is the crux: `last_value IGNORE NULLS` is defined over
  * event-time order, but a stream delivers micro-batches in arrival
  * order. An event may therefore not be filled the moment it arrives —
  * an earlier (event-time) measurement could still be in flight. The
  * operator buffers events in state and finalizes one only when the
  * watermark passes its timestamp (no earlier event can arrive any more:
  * all future rows have ts ≥ watermark), folding the buffered rows in
  * (ts, event_id) order — which makes the emitted fill EQUAL to the batch
  * window's, asserted by replay in ForwardFillStreamSpec.
  *
  * State per key is O(in-flight events within the watermark delay) plus
  * one carried value — bounded by lateness, not by history. The carried
  * value itself persists for the key's lifetime (forward fill has an
  * unbounded horizon by definition); keys that go quiet hold one Double —
  * at production scale, expire idle keys with a TTL policy if the keyspace
  * is unbounded.
  */
object ForwardFillStream {

  /** One measurement; `v` is null where the sensor dropped out. `ts` must
    * carry the stream's watermark. */
  final case class FillEvent(user_id: Long, event_id: Long, ts: Timestamp, v: Option[Double])

  /** The event, finalized: `ff` = v if present, else the latest preceding
    * non-null v of the key (None until the key's first measurement). */
  final case class FillResult(
      user_id: Long, event_id: Long, ts: Timestamp, v: Option[Double], ff: Option[Double])

  /** (micros, event_id, value) buffered until the watermark passes it. */
  final case class Pending(tsUs: Long, eventId: Long, v: Option[Double])

  final case class FillState(pending: List[Pending], carried: Option[Double])

  def forwardFill(
      events: Dataset[FillEvent], watermarkDelay: String): Dataset[FillResult] = {
    import events.sparkSession.implicits._

    def fn(uid: Long, it: Iterator[FillEvent],
        state: GroupState[FillState]): Iterator[FillResult] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(FillState(Nil, None))
      val pending = st.pending ++ it.map(e =>
        Pending(ExactSessions.micros(e.ts), e.event_id, e.v))
      // finalize strictly below the watermark: a future event may still
      // carry ts == watermark, and it could precede a held row's fill
      val (ready, hold) = pending.partition(_.tsUs < wmUs)
      var carried = st.carried
      val out = ready.sortBy(p => (p.tsUs, p.eventId)).map { p =>
        val ff = if (p.v.isDefined) { carried = p.v; p.v } else carried
        FillResult(uid, p.eventId, ExactSessions.toTs(p.tsUs), p.v, ff)
      }
      state.update(FillState(hold.sortBy(p => (p.tsUs, p.eventId)), carried))
      if (hold.nonEmpty) {
        // wake when the earliest held row becomes finalizable
        val wakeMs = hold.map(_.tsUs).min / 1000L + 1L
        state.setTimeoutTimestamp(math.max(wakeMs, state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
