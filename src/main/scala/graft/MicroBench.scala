package graft

import org.apache.spark.sql.SparkSession

/** Targeted re-measurement tool: best-of-N timings for a handful of named
  * queries, with the same session configs as [[Bench]] — for chasing a
  * single regression without paying for (or being polluted by) the full
  * suite. The box's ±50% background-load noise makes single observations
  * meaningless; this prints every rep so the spread itself is visible.
  * Usage: sbt "runMain graft.MicroBench <sfDir> <reps> <name> [name...]"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: MicroBench <sfDir> <reps> <name...>")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-graft-bench"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.locality.wait", "0")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      require(SparkEntry.queries.contains(n), s"unknown query: $n")
      SparkEntry.queries(n)(spark, sfDir).collect() // warm (JIT/codegen)
      val times = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      // True median: average the two middle elements for even reps (the old
      // `sorted(reps / 2)` reported the upper-middle, biasing noisy boxes up).
      val sorted = times.sorted
      val median =
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      println(f"[micro] $n best=${times.min}%.3f median=$median%.3f " +
        f"worst=${times.max}%.3f reps=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
