package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.streaming.CusumStream
import graft.streaming.CusumStream.{CusumAlarm, CusumEvent}

/** The streaming CUSUM must fold the identical (ts, event_id)-ordered
  * recursion the batch window computes — pinned by replaying a fixture
  * through micro-batches (out-of-order inside a batch, late inside the
  * watermark across batches) and requiring the alarm rows equal the
  * batch form's `alarm` filter row-for-row. */
class CusumStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(seconds: Long): Timestamp =
    new Timestamp(base.getTime + seconds * 1000L)

  private def runStream(batches: Seq[Seq[CusumEvent]], name: String,
      lateness: String): Seq[CusumAlarm] = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[CusumEvent]
    val q = CusumStream.cusumExact(input.toDS(), target = 10.0, slack = 2.0,
        h = 5.0, watermarkDelay = lateness)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    // sentinels: advance the watermark past everything, then give the
    // event-time timeout a batch to fire in (the ExactSessions pattern)
    input.addData(CusumEvent(99L, at(10000000), 0L, 0.0)); q.processAllAvailable()
    input.addData(CusumEvent(99L, at(10000001), 1L, 0.0)); q.processAllAvailable()
    q.stop()
    spark.table(name).as[CusumAlarm].collect().toSeq.filter(_.user_id != 99L)
  }

  private def batchAlarms(events: Seq[CusumEvent]): Seq[(Long, Timestamp, Long, Double)] =
    TimeSeries.cusum(
        events.map(e => (e.user_id, e.ts, e.event_id, e.value))
          .toDF("user_id", "ts", "event_id", "value"),
        col("user_id"), Seq(col("ts"), col("event_id")), col("value"),
        target = 10.0, slack = 2.0, h = 5.0)
      .filter(col("alarm"))
      .select("user_id", "ts", "event_id", "s")
      .as[(Long, Timestamp, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2.getTime, r._3))

  test("streamed alarms ≡ batch cusum alarm rows under out-of-order and late arrival") {
    // user 1 drifts up (alarms), user 2 stays at target (never alarms);
    // a duplicate-ts pair pins the event_id tie-break through the stream
    val events = Seq(
      CusumEvent(1L, at(0), 1L, 15.0), CusumEvent(1L, at(60), 2L, 14.0),
      CusumEvent(1L, at(120), 3L, 16.0), CusumEvent(1L, at(120), 4L, 1.0),
      CusumEvent(1L, at(180), 5L, 17.0),
      CusumEvent(2L, at(0), 6L, 12.0), CusumEvent(2L, at(60), 7L, 12.0))
    // batches arrive out of order INSIDE a batch, and one event arrives a
    // batch late but within the 2-minute lateness bound
    val streamed = runStream(Seq(
        Seq(events(1), events(0), events(5)),
        Seq(events(3), events(2), events(6)),
        Seq(events(4))),
      "cusum_parity", lateness = "2 minutes")
      .sortBy(a => (a.user_id, a.ts.getTime, a.event_id))
    val expected = batchAlarms(events)
    assert(streamed.map(a => (a.user_id, a.ts, a.event_id)) ==
      expected.map(e => (e._1, e._2, e._3)),
      s"streamed $streamed != batch $expected")
    streamed.map(_.s).zip(expected.map(_._4)).foreach { case (g, e) =>
      assert(g == e, s"statistic must be BIT-identical (same fold order): $g != $e") }
    assert(streamed.nonEmpty, "fixture must actually alarm")
    assert(!streamed.exists(_.user_id == 2L), "on-target user never alarms")
  }

  test("too-late events (past the watermark) are dropped, never folded out of order") {
    // user 8 drifts: events at t=0,60,120 arrive on time; then an event
    // with ts=30 arrives AFTER the watermark has passed 120+lateness —
    // folding it would insert a fold step behind already-retired events.
    // The streamed alarms must equal the batch form over the ON-TIME
    // events only (the late event is dropped at the parity boundary).
    val onTime = Seq(
      CusumEvent(8L, at(0), 1L, 15.0), CusumEvent(8L, at(60), 2L, 14.0),
      CusumEvent(8L, at(120), 3L, 16.0), CusumEvent(8L, at(600), 5L, 13.0))
    val tooLate = CusumEvent(8L, at(30), 4L, 50.0) // would alarm loudly if folded
    val streamed = runStream(Seq(
        Seq(onTime(0), onTime(1), onTime(2)),
        // watermark now ≥ 120s − 0s lateness; ts=30 is far behind it
        Seq(tooLate, onTime(3))),
      "cusum_late_drop", lateness = "0 seconds")
      .sortBy(a => (a.ts.getTime, a.event_id))
    val expected = batchAlarms(onTime)
    assert(streamed.map(a => (a.user_id, a.ts, a.event_id, a.s)) == expected,
      s"late event must be dropped, not folded: $streamed != $expected")
    assert(!streamed.exists(_.event_id == 4L), "the late event itself never alarms")
  }

  test("statistic persists across batches: drift split over many batches still alarms") {
    // each batch alone is under h; the accumulated statistic is not
    val events = (0 until 6).map(i =>
      CusumEvent(7L, at(i * 60L), i.toLong, 14.0)) // +2 per event
    val streamed = runStream(events.map(Seq(_)), "cusum_accum", "0 seconds")
    // s after t events = 2t: crosses h = 5 at the 3rd event (s = 6)
    assert(streamed.map(_.event_id).sorted == Seq(2L, 3L, 4L, 5L),
      s"alarms from the 3rd event on: $streamed")
    val expected = batchAlarms(events)
    assert(streamed.sortBy(_.event_id).map(_.s) == expected.map(_._4))
  }
}
