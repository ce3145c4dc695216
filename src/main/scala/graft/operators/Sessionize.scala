package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (extension surface; the reference is batch-only
  * plotting). Classic lag + running-sum formulation: a new session starts
  * when the gap to the previous event of the same key strictly exceeds
  * `gapSeconds`.
  *
  * Scale: both windows partition by the session key, so the only shuffle is
  * one exchange on `user_id`; Spark evaluates both window functions over the
  * same `(partition, order)` spec in a single sort, and AQE handles skewed
  * keys. The batch result is the parity oracle for
  * `session_window`-based streaming (SURVEY.md §2.9).
  */
object Sessionize {

  /** Adds a `sid` column: 0-based session index per `key`, ordered by
    * `(ts, tieBreak)`, with a strict `> gapSeconds` break rule. */
  def withSessionId(
      df: DataFrame,
      key: Column,
      ts: Column,
      tieBreak: Column,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    val gapMicros = gapSeconds * 1000000L
    df.withColumn(
        "brk",
        when(unix_micros(ts) - unix_micros(lag(ts, 1).over(w)) > gapMicros, 1).otherwise(0))
      .withColumn(
        "sid",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("brk")
  }
}
