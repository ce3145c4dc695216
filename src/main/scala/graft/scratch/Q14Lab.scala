package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 bench lab (scratch, not part of the library): A/B formulations of
  * the two serial-critical-path queries, q14 and q22, under Bench's exact
  * session configs. Deleted once the winner lands in Queries.scala. */
object Q14Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
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
    val t = graft.Tables(spark, sfDir)

    // current q14: repartition + distinct, then multi-countDistinct
    def v0(): DataFrame =
      t.lineitem.select("l_suppkey", "l_partkey")
        .repartition(col("l_suppkey"), col("l_partkey")).distinct()
        .agg(
          countDistinct(col("l_suppkey")).as("ds"),
          countDistinct(col("l_partkey")).as("dp"),
          count(lit(1)).as("dpair"))

    // v1: one shot — three countDistincts straight on the scan (Expand ×3,
    // map-side partials, no pre-distinct)
    def v1(): DataFrame =
      t.lineitem.agg(
        countDistinct(col("l_suppkey")).as("ds"),
        countDistinct(col("l_partkey")).as("dp"),
        countDistinct(col("l_suppkey"), col("l_partkey")).as("dpair"))

    // v2: distinct pairs WITHOUT the explicit repartition (map-side
    // partial distinct), then multi-countDistinct over the pair set
    def v2(): DataFrame =
      t.lineitem.select("l_suppkey", "l_partkey").distinct()
        .agg(
          countDistinct(col("l_suppkey")).as("ds"),
          countDistinct(col("l_partkey")).as("dp"),
          count(lit(1)).as("dpair"))

    // v3: pair-distinct once (map-side combined), then ds/dp as cheap
    // single-column distincts over the ALREADY-distinct pair set, fused
    // in one aggregate without Expand via approx-free two-level trick:
    // ds = countDistinct over pairs, dp likewise — same as v2 but with
    // the partial agg nudged to suppkey partitioning so the final
    // countDistinct(suppkey) reuses it
    def v3(): DataFrame = {
      val pairs = t.lineitem.select("l_suppkey", "l_partkey")
        .groupBy("l_suppkey", "l_partkey").agg(lit(1))
        .select("l_suppkey", "l_partkey")
      pairs.agg(
        countDistinct(col("l_suppkey")).as("ds"),
        countDistinct(col("l_partkey")).as("dp"),
        count(lit(1)).as("dpair"))
    }

    // q22 current: sessionize + group + checkpoint-materialized sort
    def w0(): DataFrame = graft.Queries.all("q22_sessionize")(t)

    // q22 no-sort: identical dag, no presentation sort (driver canon
    // sorts rows before hashing, so the ORDER BY is not result-bearing)
    def w1(): DataFrame =
      graft.operators.Sessionize.withSessionId(
          t.events, col("user_id"), col("ts"), col("event_id"), 1800L)
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n"), min("ts").as("t0"), max("ts").as("t1"))

    // v4: one shot over a packed single long key (narrower Expand rows)
    def v4(): DataFrame =
      t.lineitem
        .select(col("l_suppkey"), col("l_partkey"),
          (col("l_suppkey").cast("long") * 10000000L + col("l_partkey")).as("pk"))
        .agg(
          countDistinct(col("l_suppkey")).as("ds"),
          countDistinct(col("l_partkey")).as("dp"),
          countDistinct(col("pk")).as("dpair"))

    // v5: three independent single-distinct branches crossed (each plans
    // WITHOUT Expand; stages run in parallel inside one collect)
    def v5(): DataFrame = {
      val ds = t.lineitem.agg(countDistinct(col("l_suppkey")).as("ds"))
      val dp = t.lineitem.agg(countDistinct(col("l_partkey")).as("dp"))
      val dpair = t.lineitem.select("l_suppkey", "l_partkey").distinct()
        .agg(count(lit(1)).as("dpair"))
      ds.crossJoin(dp).crossJoin(dpair)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q14_v0_current" -> (() => v0()),
      "q14_v1_oneshot" -> (() => v1()),
      "q14_v2_nodrep" -> (() => v2()),
      "q14_v3_pairagg" -> (() => v3()),
      "q14_v4_packed" -> (() => v4()),
      "q14_v5_branches" -> (() => v5()),
      "q22_w0_current" -> (() => w0()),
      "q22_w1_nosort" -> (() => w1()))

    // value agreement first
    val r0 = v0().collect().head
    Seq(v1(), v2(), v3(), v4(), v5()).zipWithIndex.foreach { case (d, i) =>
      val r = d.collect().head
      require(r.getLong(0) == r0.getLong(0) && r.getLong(1) == r0.getLong(1)
        && r.getLong(2) == r0.getLong(2), s"v${i + 1} disagrees: $r vs $r0")
    }
    require(w1().count() == w0().count(), "q22 row count changed")

    // interleave reps round-robin so all variants sample the same load
    variants.foreach(_._2().collect()) // warm
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        f().collect()
        samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (n, _) =>
      val ts = samples(n).sorted
      val med = ts(ts.length / 2)
      println(f"[lab] $n%-18s best=${ts.min}%.3f median=$med%.3f " +
        f"reps=${samples(n).map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
