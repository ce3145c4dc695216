package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("strict > gap semantics: exactly-gap stays, gap+1s breaks") {
    val df = Seq(
      (1L, 10L, ts(0)),       // session 0
      (1L, 11L, ts(1800)),    // exactly 30 min later → same session (gap NOT > 30min)
      (1L, 12L, ts(3601)),    // 1801 s later → breaks
      (2L, 20L, ts(100))      // other user → own session 0
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize.withSessionId(df, col("user_id"), col("ts"), col("event_id"), 1800L)
      .select(col("user_id"), col("event_id"), col("sid").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 0L), (1L, 11L, 0L), (1L, 12L, 1L), (2L, 20L, 0L)))
  }

  test("invariant on fixture: no within-session consecutive gap exceeds 30 min, " +
       "and every session break exceeds it") {
    val sess = Sessionize.withSessionId(
      sf0001.events, col("user_id"), col("ts"), col("event_id"), 1800L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = sess
      .withColumn("gap", unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)))
      .withColumn("sameSession", col("sid") === lag("sid", 1).over(w))
      .filter(col("gap").isNotNull)
    assert(gaps.filter(col("sameSession") && col("gap") > 1800L * 1000000L).count() == 0)
    assert(gaps.filter(!col("sameSession") && col("gap") <= 1800L * 1000000L).count() == 0)
  }

  test("session count is invariant under repartitioning") {
    val base = Sessionize.withSessionId(
      sf0001.events, col("user_id"), col("ts"), col("event_id"), 1800L)
      .select("user_id", "sid").distinct().count()
    val repart = Sessionize.withSessionId(
      sf0001.events.repartition(13), col("user_id"), col("ts"), col("event_id"), 1800L)
      .select("user_id", "sid").distinct().count()
    assert(base == repart)
  }
}
