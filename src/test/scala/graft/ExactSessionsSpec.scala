package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ExactSessions
import graft.streaming.ExactSessions.{SessionEvent, SessionResult}

/** Pins the exactly-at-gap boundary the built-in `session_window` cannot
  * express (strict `<` merge) but the batch oracle requires (`<=` stay),
  * and proves fixture-replay parity of the flatMapGroupsWithState
  * sessionizer with batch Q22. */
class ExactSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(seconds: Long, extraMicros: Long = 0): Timestamp = {
    val t = new Timestamp(base.getTime + seconds * 1000L)
    t.setNanos((extraMicros * 1000L).toInt)
    t
  }

  private def runStream(batches: Seq[Seq[SessionEvent]], name: String,
      lateness: String = "0 seconds"): Seq[SessionResult] = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = ExactSessions.sessionizeExact(input.toDS(), 1800L, lateness)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    // two sentinel batches: the first advances the watermark past every
    // session, the second gives the event-time timeout a batch to fire in
    input.addData(SessionEvent(99L, at(10000000))); q.processAllAvailable()
    input.addData(SessionEvent(99L, at(10000001))); q.processAllAvailable()
    q.stop()
    spark.table(name).as[SessionResult].collect().toSeq.filter(_.user_id != 99L)
  }

  test("event exactly at the 30-min gap stays in the session; one microsecond past splits") {
    val got = runStream(Seq(Seq(
      SessionEvent(1L, at(0)), SessionEvent(1L, at(1800)),
      SessionEvent(2L, at(0)), SessionEvent(2L, at(1800, 1)))), "exact_boundary")
    val byUser = got.groupBy(_.user_id).view.mapValues(_.map(_.n).sorted).toMap
    assert(byUser(1L) == Seq(2L), s"exactly-at-gap must merge (oracle <= stay): $got")
    assert(byUser(2L) == Seq(1L, 1L), s"one microsecond past the gap must split: $got")
    // Built-in session_window ALSO merges the boundary event: adjacent
    // half-open windows [0,1800) and [1800,3600) coalesce. This refutes
    // the round-1 note that session_window uses a strict-< merge — the
    // two implementations agree even at the exact gap (pinned here so a
    // Spark behavior change would surface).
    val sw = Seq((1L, at(0)), (1L, at(1800))).toDF("user_id", "ts")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id")).count()
    assert(sw.count() == 1L, "session_window merges the exactly-at-gap event too")
    val sw2 = Seq((2L, at(0)), (2L, at(1800, 1))).toDF("user_id", "ts")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id")).count()
    assert(sw2.count() == 2L, "one microsecond past the gap splits under session_window too")
  }

  test("a bridging event merges two open sessions (state merge path)") {
    // batch 1 opens two sessions 50 min apart; batch 2's event (at +25 min,
    // within gap of BOTH) arrives while both are open and must fuse them.
    // The 2h lateness bound keeps the out-of-order bridge event ahead of
    // the watermark (with 0s it would be dropped as late — that path is
    // LateDataSpec's subject).
    val got = runStream(Seq(
      Seq(SessionEvent(1L, at(0)), SessionEvent(1L, at(3000))),
      Seq(SessionEvent(1L, at(1500)))), "exact_bridge", lateness = "2 hours")
    assert(got.map(_.n) == Seq(3L), s"expected one fused session of 3 events: $got")
  }

  test("micros/toTs round-trip exactly, including pre-epoch timestamps (floor semantics)") {
    // NOTE pre-epoch events cannot flow through the STREAM itself: Spark
    // initializes the event-time watermark to epoch 0, so they are
    // dropped as late in the first batch regardless of operator. The
    // conversions must still be correct (truncate-toward-zero would turn
    // -0.5 s into +0.5 s once the always-positive nanos are added).
    val preA = Timestamp.valueOf("1969-12-31 23:59:59")
    preA.setNanos(500000000) // -0.5 s from epoch
    assert(ExactSessions.micros(preA) == -500000L)
    val cases = Seq(preA, Timestamp.valueOf("1969-12-31 23:45:00"), base,
      at(1800, 1), at(123456, 999999))
    cases.foreach { ts =>
      val rt = ExactSessions.toTs(ExactSessions.micros(ts))
      assert(rt == ts, s"round-trip mismatch: $ts -> $rt")
    }
  }

  test("fixture replay: finalized sessions equal batch Q22 sessionization") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val events = t.events.select(col("user_id"), col("ts"))
      .as[SessionEvent].collect().toSeq
    val got = runStream(Seq(events), "exact_parity")
      .map(r => (r.user_id, r.t0, r.t1, r.n)).toSet
    val batch = Queries.q22(t)
      .select(col("user_id"), col("t0"), col("t1"), col("n"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got == batch, s"stream/batch mismatch: ${got.diff(batch)} vs ${batch.diff(got)}")
  }
}
