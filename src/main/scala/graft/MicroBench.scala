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

/** Headline-suite-wall experiment rig — [[Bench]]'s concurrent pass in
  * isolation, for chasing the suite-wall metric without paying for the
  * extension timings (the full Bench run is ~12 min; this is ~1 min).
  * Prints EVERY pass wall plus, per pass, the slowest in-pass query —
  * the wall's floor is max(single query) and its excess over that floor
  * is scheduler/dispatch/planning contention, which is what this tool
  * makes visible. Env knobs mirror Bench: SPARK_GRAFT_SCHED (FIFO/FAIR),
  * SPARK_GRAFT_THREADS (submit threads, default 24).
  * Usage: sbt "runMain graft.SuiteWall <sfDir> <passes>" */
object SuiteWall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 10
    val threads = sys.env.getOrElse("SPARK_GRAFT_THREADS", "24").toInt
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-graft-bench"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUF", "8"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.locality.wait", "0")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", sys.env.getOrElse("SPARK_GRAFT_SCHED", "FIFO"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Queries.all.keys.toSeq.sorted
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(runOne); names.foreach(runOne) // warm-up, as Bench
    // SPARK_GRAFT_ORDER=lpt submits longest-first (ranked by a serial
    // pass) — FIFO grants task slots in submission order, so a heavy
    // query submitted last becomes the pass's straggler (its in-pass
    // completion IS the wall); longest-processing-time-first is the
    // classic makespan heuristic
    val ordered = sys.env.get("SPARK_GRAFT_ORDER") match {
      case Some("lpt") =>
        val ranked = names.map(n => n -> runOne(n)).sortBy(-_._2)
        println("[wall] lpt order: " + ranked.take(5).map {
          case (n, t) => f"$n($t%.2f)" }.mkString(", ") + " …")
        ranked.map(_._1)
      case _ => names
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val walls = (1 to passes).map { p =>
      val t0 = System.nanoTime()
      val perQ = Await.result(
        Future.sequence(ordered.map(n => Future(n -> runOne(n)))), 30.minutes)
      val wall = (System.nanoTime() - t0) / 1e9
      val (slowN, slowT) = perQ.maxBy(_._2)
      println(f"[wall] pass$p%02d wall=$wall%.3f slowest=$slowN ($slowT%.3f) " +
        f"sumq=${perQ.map(_._2).sum}%.2f")
      wall
    }
    println(f"[wall] best=${walls.min}%.3f median=${walls.sorted.apply(passes / 2)}%.3f threads=$threads")
    pool.shutdown()
    spark.stop()
  }
}
