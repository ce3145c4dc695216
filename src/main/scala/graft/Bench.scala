package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full declared query suite on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query and total
  * wall seconds.
  *
  * Methodology mirrors BASELINE.md: one warm SparkSession, run the suite
  * once to warm codegen/caches, then time the second pass (the oracle's
  * "best of 3 warm" analogue). Each query is forced with `collect()` so the
  * full result is actually computed and materialized — `count()` would let
  * Catalyst prune the computed columns away.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted

    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).collect(); () }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach(runOne)                       // warm-up pass
    val results = names.map(n => n -> runOne(n)) // timed pass

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
