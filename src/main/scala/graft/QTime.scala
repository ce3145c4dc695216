package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: serial per-query timing at sf0.1 outside the full Bench
  * harness — `runMain graft.QTime q168_adjusted_rand,q167_robust_stats`
  * prints 3 cleared-cache reps per named query. Used to adjudicate drift
  * flags (a flagged query re-measured on an idle box separates real
  * regressions from capture-window load noise). */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args(0).split(",").foreach { n =>
      (1 to 3).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        Tables.clearPairCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).collect()
        println(f"[qtime] $n rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
