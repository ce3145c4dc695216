package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming parity (SURVEY.md §2.9): replay `events.parquet` through a
  * file-source stream; the final tumbling-window / session-window state
  * must equal the batch Q21/Q22 results. */
class StreamingParitySpec extends SparkSpec {

  /** File-source stream of the sf0.001 events table (nanos normalized the
    * same way as Tables.events). */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def eventsStream: DataFrame =
    spark.readStream.schema(Tables.schemas("events")).parquet(streamDir)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))

  private def runToCompletion(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("tumbling 1h window stream state equals batch Q21") {
    val streamed = runToCompletion(
      eventsStream
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        // same rounding rule as batch q21 (Rounding.portable): built-in
        // round would diverge on decimal-half-way sums
        .agg(count(lit(1)).as("n"),
          graft.functions.Rounding.portable(sum("value"), 2).as("s")),
      "t21")
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("s"))
    val batch = Queries.q21(sf0001)
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("session_window(30 min) stream state equals batch Q22 sessionization") {
    val streamed = runToCompletion(
      eventsStream
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), min("ts").as("t0"), max("ts").as("t1")),
      "t22")
      .select(col("user_id"), col("t0"), col("t1"), col("n"))
    val batch = Queries.q22(sf0001).select(col("user_id"), col("t0"), col("t1"), col("n"))
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("sliding 1h/15m window stream state equals batch q43") {
    val streamed = runToCompletion(
      graft.streaming.StreamOps.sliding(
        eventsStream, col("ts"), "1 hour", "15 minutes",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n"),
          graft.functions.Rounding.portable(sum("value"), 2).as("s"))),
      "t43")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("s"))
    val batch = CoverageQueries.q43(sf0001)
    assert(streamed.collect().toSet == batch.collect().toSet)
  }

  test("stream-stream interval join pairs equal batch Q23's join") {
    val e1 = eventsStream.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u1"), col("ts").as("ts1"))
    val e2 = eventsStream.select(col("user_id").as("u2"), col("ts").as("ts2"))
    val joined = graft.streaming.StreamOps.intervalJoin(
      e1, "ts1", "1 hour", e2, "ts2", "1 hour",
      col("u1") === col("u2"), windowSeconds = 600L)
    val q = joined.select(col("event_id"), col("ts2"))
      .writeStream.format("memory").queryName("t23")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("t23").collect().toSet

    val b = sf0001.events
    val b1 = b.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u1"), col("ts").as("ts1"))
    val b2 = b.select(col("user_id").as("u2"), col("ts").as("ts2"))
    val batch = b1.join(b2,
        col("u1") === col("u2") &&
        col("ts2") > col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 600 SECONDS"))
      .select(col("event_id"), col("ts2")).collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "fixture must produce at least one joined pair")
  }

  test("watermarked windowed stream (1h watermark) still converges to batch Q21 counts") {
    val streamed = runToCompletion(
      eventsStream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      "t21w")
      .select(col("window.start").as("h"), col("event_type"), col("n"))
    val batch = Queries.q21(sf0001).select(col("h"), col("event_type"), col("n"))
    assert(streamed.collect().toSet == batch.collect().toSet)
  }
}
