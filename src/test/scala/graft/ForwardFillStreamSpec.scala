package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.streaming.ForwardFillStream
import graft.streaming.ForwardFillStream.{FillEvent, FillResult}

/** Streaming forward fill: batch-window parity on fixture replay, plus
  * the cross-batch carry and out-of-order-fill cases that make the
  * watermark buffering necessary. */
class ForwardFillStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(seconds: Long): Timestamp = new Timestamp(base.getTime + seconds * 1000L)

  private def runStream(batches: Seq[Seq[FillEvent]], name: String,
      lateness: String = "0 seconds"): Seq[FillResult] = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FillEvent]
    val q = ForwardFillStream.forwardFill(input.toDS(), lateness)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    // two sentinel batches: advance the watermark, then let the timeout fire
    input.addData(FillEvent(99L, 0L, at(10000000), None)); q.processAllAvailable()
    input.addData(FillEvent(99L, 1L, at(10000001), None)); q.processAllAvailable()
    q.stop()
    spark.table(name).as[FillResult].collect().toSeq.filter(_.user_id != 99L)
  }

  test("carries values forward across micro-batches; null until first value") {
    val got = runStream(Seq(
      Seq(FillEvent(1L, 1L, at(0), None), FillEvent(1L, 2L, at(10), Some(5.0))),
      Seq(FillEvent(1L, 3L, at(20), None)),
      Seq(FillEvent(1L, 4L, at(30), None), FillEvent(1L, 5L, at(40), Some(7.0)))
    ), "ff_carry")
    val byId = got.map(r => r.event_id -> r.ff).toMap
    assert(byId == Map(1L -> None, 2L -> Some(5.0), 3L -> Some(5.0),
      4L -> Some(5.0), 5L -> Some(7.0)))
  }

  test("an out-of-order measurement fills later-arriving-but-earlier-finalized rows") {
    // the null row at t=20 arrives BEFORE the t=10 measurement; with a
    // lateness allowance the t=10 value must still be what fills t=20
    val got = runStream(Seq(
      Seq(FillEvent(1L, 1L, at(0), Some(1.0)), FillEvent(1L, 3L, at(20), None)),
      Seq(FillEvent(1L, 2L, at(10), Some(9.0)))
    ), "ff_ooo", lateness = "1 hour")
    val byId = got.map(r => r.event_id -> r.ff).toMap
    assert(byId(3L) == Some(9.0),
      s"t=20 must be filled by the out-of-order t=10 measurement, got $got")
  }

  test("fixture replay equals the batch window (events sf0.001, synthesized nulls)") {
    val ev = sf0001.events
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"))
    val batch = ev
      .withColumn("ff", TimeSeries.forwardFill(col("v"),
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .select(col("event_id"), col("ff"))
      .as[(Long, Option[Double])].collect().toMap
    // replay in two arrival-order batches (split mid-stream)
    val all = ev.as[FillEvent].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = all.splitAt(all.length / 2)
    val got = runStream(Seq(b1, b2), "ff_replay")
    assert(got.size == all.size, s"every event must be emitted exactly once")
    got.foreach { r => assert(r.ff == batch(r.event_id),
      s"event ${r.event_id}: stream ${r.ff} != batch ${batch(r.event_id)}") }
  }
}
