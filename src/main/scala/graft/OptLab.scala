package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round probe harness (r20): times isolated legs of the
  * heavy queries under the Bench session configs so a regression can be
  * attributed to a plan component rather than a whole query. Dev tool in
  * the QTime/MicroBench family — not part of any gate.
  * Usage: sbt "runMain graft.OptLab <probe> [reps]"
  */
object OptLab {
  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("q185parts")
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(3)
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = Tables(spark, dir)

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.collect() // warm
      val ts = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        mk.collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[optlab] $name reps=${ts.map(x => f"$x%.3f").mkString(",")} min=${ts.min}%.3f")
    }

    probe match {
      case "q185parts" =>
        val base = t.lineitem.select(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("v"))
          .filter(col("v").isNotNull)
        val bins = 32
        val fracs = (1 until bins).map(k =>
          s"CAST($k AS DOUBLE) / $bins").mkString(", ")
        time("edges_percentile") {
          base.agg(expr(s"percentile(v, array($fracs))").as("e"))
        }
        time("edges_percentile_pregroup") {
          base.groupBy("v").agg(count(lit(1)).as("c"))
            .agg(expr(s"percentile(v, array($fracs), c)").as("e"))
        }
        // binning with FIXED edge literals (no percentile subtree)
        val edgeLits = (1 until bins).map(k => 900.0 + k * 3000.0)
        time("binning_fixed_edges") {
          base.select(col("g"),
            graft.operators.TimeSeries.binOf(col("v"), edgeLits).as("b"))
            .groupBy("g", "b").agg(count(lit(1)).as("c"))
        }
        time("q185_full") { SparkEntry.queries("q185_ks_binned")(spark, dir) }
      case "copart" =>
        // does a join against the pre-partitioned cache skip the exchange?
        import org.apache.spark.storage.StorageLevel
        val fp = graft.operators.TextAnalysis.hashedFeaturePairs(
          t.documents, col("doc_id"), col("text"), 32).persist(StorageLevel.MEMORY_AND_DISK)
        val fpB = fp.repartition(col("__lh_b")).sortWithinPartitions("__lh_b")
          .persist(StorageLevel.MEMORY_AND_DISK)
        fpB.count()
        val w = fpB.select(col("__lh_b")).distinct()
          .withColumn("__lh_wb", lit(0.0)).localCheckpoint()
        val z = fpB.join(w, "__lh_b").groupBy("__lh_id")
          .agg(sum(col("__lh_x") * col("__lh_wb")).as("__lh_z"))
        val p = z.queryExecution.executedPlan.toString
        println(s"[optlab] copart exchanges=${"Exchange".r.findAllIn(p).size} " +
          s"smj=${"SortMergeJoin".r.findAllIn(p).size} " +
          s"bhj=${"BroadcastHashJoin".r.findAllIn(p).size} " +
          s"imts=${"InMemoryTableScan".r.findAllIn(p).size}")
        println(p.linesIterator.take(25).mkString("\n"))
      case "planstats" =>
        // non-AQE plan stats for named queries: real scan / reuse counts
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        args(1).split(",").foreach { n =>
          val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
            .queryExecution.executedPlan.toString
          println(s"[optlab] $n scans=${"Scan parquet".r.findAllIn(p).size} " +
            s"reused=${"ReusedExchange".r.findAllIn(p).size} " +
            s"imts=${"InMemoryTableScan".r.findAllIn(p).size}")
        }
      case "ablife" =>
        // r21 lifecycle A/B: same session, alternating reps — A = the
        // CacheDiscipline materialize-then-release form, B = the r20
        // leak form (sys-prop switch in CacheDiscipline). Interleaving
        // makes the comparison load-robust (this box's bursts straddle
        // whole runs).
        args.last.split(",").foreach { n =>
          def rep(leak: Boolean): Double = {
            spark.sharedState.cacheManager.clearCache()
            Tables.clearPairCache()
            if (leak) sys.props("graft.ab.leak") = "1"
            else { sys.props.remove("graft.ab.leak"); () }
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, dir).collect()
            (System.nanoTime() - t0) / 1e9
          }
          rep(false); rep(true) // warm both paths
          val as = Seq.newBuilder[Double]; val bs = Seq.newBuilder[Double]
          for (_ <- 1 to reps) { as += rep(false); bs += rep(true) }
          sys.props.remove("graft.ab.leak")
          val (a, b) = (as.result(), bs.result())
          println(f"[optlab] $n A_mat min=${a.min}%.3f (${a.map(x => f"$x%.3f").mkString(",")}) " +
            f"B_leak min=${b.min}%.3f (${b.map(x => f"$x%.3f").mkString(",")})")
        }
      case "binsab" =>
        // r21: linear O(bins) fold vs binOfSortedCol binary search at
        // bins = 32 (the gated case) and 1000 (the documented default),
        // interleaved over the same raw-row table (the approx branch's
        // shape — corpus-sized input, the regime where per-row cost is
        // the whole pass)
        val base = t.lineitem.select(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("v"))
          .filter(col("v").isNotNull).persist()
        base.count()
        for (bins <- Seq(32, 1000)) {
          val edges = (1 until bins).map(k => 900.0 + k * 60000.0 / bins)
          val eCol = typedlit(edges)
          def run(bin: org.apache.spark.sql.Column): Double = {
            val t0 = System.nanoTime()
            base.select(col("g"), bin.as("b")).groupBy("g", "b")
              .agg(count(lit(1)).as("c")).collect()
            (System.nanoTime() - t0) / 1e9
          }
          val lin = aggregate(eCol, lit(0L),
            (acc, e) => acc + when(col("v") > e, 1L).otherwise(0L))
          val bs = graft.operators.TimeSeries.binOfSortedCol(col("v"), eCol, bins - 1)
          run(lin); run(bs) // warm
          val (ls, bss) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
          (1 to reps).foreach { _ => ls += run(lin); bss += run(bs) }
          val (l, b) = (ls.result(), bss.result())
          println(f"[optlab] binsab bins=$bins linear min=${l.min}%.3f " +
            f"(${l.map(x => f"$x%.3f").mkString(",")}) binsearch min=${b.min}%.3f " +
            f"(${b.map(x => f"$x%.3f").mkString(",")})")
        }
        base.unpersist()
      case "q160ab" =>
        // r21: old (no vector cache, ~9 parquet re-reads across the
        // eager init/train passes) vs committed (one released cache),
        // interleaved in one session
        import graft.operators.Similarity
        def oldQ160(): DataFrame = {
          val e = t.embeddings.select(col("vec_id"),
            col("embedding").cast("array<double>").as("e"))
          val init = Similarity.scalableInitCentroids(e, k = 4, rounds = 2, l = 4)
          val trained = Similarity.trainCentroidsFrom(e, init, iters = 2, dim = 64)
          val census = Similarity.ivfAssign(e, trained)
            .groupBy("cid").agg(count(lit(1)).as("n_members"))
          trained.select(col("vec_id").as("cid"), posexplode(col("e")))
            .select(col("cid"), col("pos").cast("long").as("i"),
              graft.functions.Rounding.portable(col("col"), 6).as("v6"))
            .join(census, "cid")
            .select(col("cid"), col("i"), col("v6"), col("n_members"))
        }
        def newQ160(): DataFrame = SparkEntry.queries("q160_kmeans_pipeline")(spark, dir)
        val (oldT, newT) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
        def repQ(mk: () => DataFrame): Double = {
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime(); mk().collect(); (System.nanoTime() - t0) / 1e9
        }
        repQ(oldQ160 _); repQ(newQ160 _)
        (1 to reps).foreach { _ => oldT += repQ(oldQ160 _); newT += repQ(newQ160 _) }
        val (o, nw) = (oldT.result(), newT.result())
        println(f"[optlab] q160 old min=${o.min}%.3f (${o.map(x => f"$x%.3f").mkString(",")}) " +
          f"new min=${nw.min}%.3f (${nw.map(x => f"$x%.3f").mkString(",")})")
      case "dumpplan" =>
        // args(1) = comma-separated query names; writes formatted plans
        // (sf0.001, plain-sort mode like PlanDump) to plans/r21/<q>_after.txt
        sys.props("spark.graft.sortMode") = "plain"
        args(1).split(",").foreach { n =>
          val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/r21/${n}_after.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          println(s"[optlab] wrote plans/r21/${n}_after.txt")
        }
      case "q185plan" =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val df = SparkEntry.queries("q185_ks_binned")(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        println(s"[optlab] ScanParquet=${"Scan parquet".r.findAllIn(p).size} " +
          s"ReusedExchange=${"ReusedExchange".r.findAllIn(p).size} " +
          s"InMemoryTableScan=${"InMemoryTableScan".r.findAllIn(p).size} " +
          s"InMemoryRelation=${"InMemoryRelation".r.findAllIn(p).size}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/q185_new_plan.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      case "q185ab" =>
        // interleaved A/B: old two-scan builtin-percentile shape vs the
        // new shared-gv ExactQuantiles shape, plus the binning-only leg
        val base = t.lineitem.select(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("v"))
          .filter(col("v").isNotNull)
        val fracsSql = (1 until 32).map(k =>
          s"CAST($k AS DOUBLE) / 32").mkString(", ")
        def oldShape(): DataFrame = {
          val edges = base.agg(expr(s"percentile(v, array($fracsSql))").as("e"))
          base.crossJoin(broadcast(edges))
            .select(col("g"), aggregate(col("e"), lit(0L),
              (acc, e) => acc + when(col("v") > e, 1L).otherwise(0L)).as("b"))
            .groupBy("g", "b").agg(count(lit(1)).as("c"))
        }
        def newShape(): DataFrame =
          SparkEntry.queries("q185_ks_binned")(spark, dir)
        def binFromGv(): DataFrame = {
          val gv = base.groupBy("g", "v").agg(count(lit(1)).as("w"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val edges = graft.operators.ExactQuantiles.quantileEdgesWeighted(
            gv, col("v"), col("w"), (1 until 32).map(_.toDouble / 32), "e")
          gv.crossJoin(broadcast(edges))
            .select(col("g"), aggregate(col("e"), lit(0L),
              (acc, e) => acc + when(col("v") > e, 1L).otherwise(0L)).as("b"),
              col("w"))
            .groupBy("g", "b").agg(sum("w").as("c"))
        }
        (1 to reps).foreach { i =>
          for ((nm, mk) <- Seq("old_edges_plus_bin" -> (oldShape _),
              "new_gv_to_bin" -> (binFromGv _), "new_q185_full" -> (newShape _))) {
            spark.sharedState.cacheManager.clearCache()
            val t0 = System.nanoTime()
            mk().collect()
            println(f"[optlab] $nm rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
        }
      case "q185steps" =>
        val base = t.lineitem.select(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("v"))
          .filter(col("v").isNotNull)
        val fracs = (1 until 32).map(_.toDouble / 32)
        time("gv_build") {
          base.groupBy("g", "v").agg(count(lit(1)).as("w"))
        }
        time("edges_from_gv") {
          val gv = base.groupBy("g", "v").agg(count(lit(1)).as("w"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          graft.operators.ExactQuantiles.quantileEdgesWeighted(
            gv, col("v"), col("w"), fracs, "e")
        }
      case "eqedges" =>
        val base = t.lineitem.select(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("v"))
          .filter(col("v").isNotNull)
        val bins = 32
        val fracs = (1 until bins).map(_.toDouble / bins)
        val fracsSql = (1 until bins).map(k =>
          s"CAST($k AS DOUBLE) / $bins").mkString(", ")
        // bit-identity check first
        val a = base.agg(expr(s"percentile(v, array($fracsSql))").as("e"))
          .head().getSeq[Double](0)
        val b = graft.operators.ExactQuantiles
          .quantileEdges(base, col("v"), fracs, "e").head().getSeq[Double](0)
        val same = a.length == b.length && a.zip(b).forall { case (x, y) =>
          java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y) }
        println(s"[optlab] eqedges bit-identical=$same n=${a.length}")
        if (!same) {
          a.zip(b).zipWithIndex.filter { case ((x, y), _) => x != y }
            .take(5).foreach { case ((x, y), i) =>
              println(s"[optlab]   frac#$i builtin=$x new=$y") }
        }
        time("edges_builtin") {
          base.agg(expr(s"percentile(v, array($fracsSql))").as("e"))
        }
        time("edges_distributed") {
          graft.operators.ExactQuantiles.quantileEdges(base, col("v"), fracs, "e")
        }
      case other => sys.error(s"unknown probe: $other")
    }
    spark.stop()
  }
}
