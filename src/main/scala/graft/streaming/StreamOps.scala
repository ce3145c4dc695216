package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming surface of the engine (SURVEY.md §2.9; the
  * reference is batch-only — this is declared extension surface). The same
  * declarative transforms run over `readStream` inputs; batch Q21/Q22 are
  * the parity oracles (asserted in StreamingParitySpec).
  */
object StreamOps {

  /** Tumbling-window aggregate (batch parity: Q21's `date_trunc('hour')` ≡
    * `window(ts, dur)` start). */
  def tumbling(
      events: DataFrame, ts: Column, duration: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy(window(ts, duration) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Sliding-window variant. */
  def sliding(
      events: DataFrame, ts: Column, duration: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy(window(ts, duration, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Gap session aggregate (batch parity: Q22's lag+running-sum
    * sessionization — equality asserted on the fixtures). */
  def session(
      events: DataFrame, ts: Column, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.groupBy(session_window(ts, gap) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Watermarked stream: late rows beyond `delay` are dropped from state. */
  def withLateness(events: DataFrame, tsCol: String, delay: String): DataFrame =
    events.withWatermark(tsCol, delay)

  /** Stateful streaming dedup: exact-dup suppression keyed by content
    * hash, state bounded by the watermark (Q24's streaming variant). */
  def dedupWithinWatermark(
      events: DataFrame, tsCol: String, delay: String, keyCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join (Q23's shape as two live streams): equi
    * key + event-time range conjunct. Both sides carry watermarks and the
    * join condition bounds `rightTs` to a window after `leftTs`, which is
    * exactly what Spark's state-cleanup analysis needs to evict buffered
    * rows — without the range bound the join state would grow forever.
    * Batch parity: the same expression over batch frames equals Q23's
    * pair set (StreamingParitySpec). */
  def intervalJoin(
      left: DataFrame, leftTs: String, leftDelay: String,
      right: DataFrame, rightTs: String, rightDelay: String,
      equi: Column, windowSeconds: Long): DataFrame = {
    val l = left.withWatermark(leftTs, leftDelay)
    val r = right.withWatermark(rightTs, rightDelay)
    l.join(r, equi &&
      col(rightTs) > col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $windowSeconds SECONDS"))
  }
}
