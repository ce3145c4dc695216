package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Multi-batch watermark semantics: the file-replay parity tests process
  * everything in one trigger, so nothing is ever late there. This drives
  * a MemoryStream across batches and proves a row behind the watermark is
  * actually dropped from append-mode windowed state (§2.9 "late rows
  * dropped per policy"). */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  test("append-mode window drops rows behind the watermark across batches") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val windowed = input.toDF().toDF("sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = windowed.writeStream.format("memory").queryName("late")
      .outputMode("append").start()

    // batch 1: three rows in window [00:00,00:10), plus one at 00:25 that
    // advances the watermark past that window's end
    input.addData((0L, 1L), (120L, 2L), (540L, 3L), (1500L, 4L))
    q.processAllAvailable()
    // batch 2: a LATE row for the already-finalized first window (00:02)
    input.addData((125L, 99L))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to flush remaining windows
    input.addData((4000L, 5L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("late")
      .select(col("window.start").cast("long").as("start"), col("n"))
      .as[(Long, Long)].collect().toMap
    assert(rows(0L) == 3L,
      s"first window must hold its pre-watermark count, late row dropped; got $rows")
    assert(rows(1200L) == 1L, s"the 1500s event belongs to window [1200,1800); got $rows")
  }
}
