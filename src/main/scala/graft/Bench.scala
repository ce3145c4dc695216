package graft

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full declared query suite on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Methodology (mirrors BASELINE.md's "best of 3, warm" oracle run):
  *  - one warm SparkSession; a full warm-up pass first (codegen + JIT);
  *  - `queries` = per-query wall seconds from a serial timed pass (true
  *    single-query latency), `serial_total` their sum;
  *  - `value` (the headline suite total) = best wall-clock of two passes
  *    that run the 30 queries with inter-query concurrency (16 submit
  *    threads, one shared scheduler) — the engine's suite throughput. The
  *    oracle's 1.03 s likewise used all 32 cores; Spark's per-job dispatch
  *    floor in this sandbox is ~40 ms, so intra-query parallelism alone
  *    cannot amortize it at toy scale, inter-query concurrency does.
  *  - every query is forced with `collect()` (`count()` would let Catalyst
  *    prune the computed columns).
  *
  * Harness configs are sized for the bench scale factor (~600 k rows), NOT
  * for production: AQE is off because per-stage materialization latency
  * dominates at toy scale (the library itself runs fine with AQE on — see
  * Verify), `maxPartitionBytes=1m` splits the ≤11 MB files across cores,
  * and shuffle.partitions=8 keeps post-shuffle task counts proportionate.
  * At 100 TB the same queries run with AQE on and default split sizes.
  */
object Bench {

  /** Absolute per-query wall ceiling (seconds) at the bench scale factor.
    *
    * The drift gate compares against a PRIOR reading, so a brand-new
    * pathological query has no baseline and is invisible to it — exactly
    * how r15's q158 (619.6 s/run of driver-side plan explosion, bolted on
    * in the round's final minutes) took down the whole bench capture
    * (rc=124) with no flag anywhere. Any query whose best-of-2 exceeds
    * this budget is named in the emitted JSON's `"slow"` array even when
    * it eventually completes: at sf0.1 every healthy query runs in
    * ≤ ~8 s under load, so 30 s is pure headroom, not tuning. */
  val slowCeilingSec: Double = 30.0

  /** Names whose timing exceeds `ceiling`, as the JSON array fragment the
    * bench line carries — factored out so the gate is unit-testable
    * (`BenchSpec`). */
  def slowJson(timings: Seq[(String, Double)], ceiling: Double = slowCeilingSec): String =
    timings.collect { case (n, t) if t > ceiling => n }
      .sorted.map("\"" + _ + "\"").mkString("[", ",", "]")

  /** LOAD CANARY (VERDICT r17 #4): a leg whose reps ran while the machine
    * was loaded reads as a phantom regression — r17's driver capture
    * reported q120 at 24.8 s (26×) that reproduced at 0.90 s idle, and a
    * round's diagnosis budget went to chasing it. The bench now times a
    * fixed trivial job (the canary) next to every timed leg; a leg whose
    * canary reading exceeds `factor` × the calibrated idle base is
    * annotated in the JSON, so a contaminated capture names itself.
    * Factored for `BenchSpec`: returns the flagged leg names. */
  def canaryFlags(samples: Seq[(String, Double)], base: Double,
      factor: Double = 2.0): Seq[String] =
    samples.collect { case (n, c) if c > factor * base => n }.sorted

  /** Per-pass [wall, canary] record as a JSON array fragment (VERDICT
    * r19 #2 — the capture's own load-vs-plan adjudication data).
    * Factored for `BenchSpec`: the driver parses this field, so its
    * shape is contract, not formatting. */
  def passesJson(samples: Seq[(Double, Double)]): String =
    samples.map { case (w, c) => s"[$w,$c]" }.mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-graft-bench"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.locality.wait", "0")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // scheduler mode for the concurrent pass, env-overridable for a/b
      // runs (serial timings are one job at a time and unaffected)
      .config("spark.scheduler.mode", sys.env.getOrElse("SPARK_GRAFT_SCHED", "FIFO"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline suite = the 30 declared queries (comparable to BASELINE.md);
    // extension operators (q31+) are timed separately below.
    val names = Queries.all.keys.toSeq.sorted
    val extNames = (ExtensionQueries.all.keys ++ CoverageQueries.all.keys ++
      PipelineQueries.all.keys).toSeq.sorted

    // concurrent passes mutate this from many submit threads
    val failed: java.util.Set[String] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).collect(); () }
      catch { case e: Throwable =>
        failed.add(name)
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // the canary job: fixed CPU-bound work through the same scheduler the
    // timed legs use; ~tens of ms idle, scales with contention
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(4000000L)
        .agg(org.apache.spark.sql.functions.sum("id")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val canarySamples = scala.collection.mutable.Map[String, Double]()
    def sampleCanary(leg: String): Unit = {
      val c = canary()
      canarySamples(leg) = math.max(canarySamples.getOrElse(leg, 0.0), c)
    }

    names.foreach(runOne)                        // warm-up passes
    names.foreach(runOne)
    // calibrate the canary base AFTER warm-up (codegen paid), best of 5
    canary()
    val canaryBase = (1 to 5).map(_ => canary()).min
    // serial timed: best of 2 per query (oracle methodology is best-of-3);
    // canary BOTH sides of each run — a leading-only sample misses load
    // arriving mid-leg and misattributes the flag to the NEXT leg
    def timedSerial(n: String): (String, Double) = {
      sampleCanary(n); val r = runOne(n); sampleCanary(n); n -> r
    }
    val p1 = names.map(timedSerial).toMap
    val p2 = names.map(timedSerial).toMap
    val serial = names.map(n => n -> math.min(p1(n), p2(n)))
    val serialTotal = serial.map(_._2).sum

    // 24 submit threads: sweeps showed 16 suffers multi-second outliers
    // under background load while 24-30 hold a tight 2.3-2.7s spread; 24
    // leaves headroom on the 32 executor slots
    val threads = 24
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // longest-first submission (LPT makespan heuristic, ranked by the
    // serial pass above): FIFO grants task slots in job-submission order,
    // so a heavy query submitted late queues its every stage behind 29
    // earlier jobs and its in-pass completion becomes the wall (measured:
    // q22 at 0.4s serial ran 2-10s in-pass when submitted 23rd, and the
    // best-of-8 wall dropped 2.05s -> 1.75s just from reordering)
    val lptOrder = names.sortBy(n => -math.min(p1(n), p2(n)))
    def concurrentPass(): Double = {
      val t0 = System.nanoTime()
      Await.result(Future.sequence(lptOrder.map(n => Future(runOne(n)))), 30.minutes)
      (System.nanoTime() - t0) / 1e9
    }
    // best-of-16 (10 until r19): the sandbox carries erratic background
    // load (±50% on identical runs — round 8 measured 2.60→2.01 s on one
    // jar purely with load, and r19 watched load arrive in multi-minute
    // bursts that straddled entire 10-pass windows); more passes make
    // the quiet-window best-case observable within the driver's single
    // invocation, at ~2.5 s per extra pass — 6 more passes buy ~15 s of
    // extra sampling against bursts that last minutes.
    // VERDICT r19 #2 (self-certifying captures): each pass records its own
    // wall AND a canary reading taken right after it, so the artifact
    // carries the load-vs-plan adjudication itself — a capture whose best
    // pass rode a quiet window shows it (low wall, canary ≈ base), and a
    // burst that straddled passes 3-9 is visible as a correlated
    // wall/canary plateau instead of a mystery.
    val passSamples: Seq[(Double, Double)] =
      (1 to 16).map { _ => val w = concurrentPass(); (w, canary()) }
    val wall = passSamples.map(_._1).min
    // ADVICE r19 (protocol comparability): the committed cross-round
    // series through r18 used best-of-10; emit that wall too so ratios
    // against prior rounds never conflate protocol with plan change.
    val wallBest10 = passSamples.take(10).map(_._1).min
    pool.shutdown()

    extNames.foreach(runOne)                     // extensions: warm + time
    // The dedup-cluster queries consume TWO shared suite-level inputs —
    // the memoized MinHash pair table (Tables.documentNearDupPairs; q72 +
    // q102 + the CC consumers) and the resolved component table on top of
    // it (Tables.documentNearDupComponents; q57/q85/q102/q106/q109).
    // Timing each consumer cold would multi-count the shared builds, so
    // each build is timed as its own `shared_*` entry (best of 2 full
    // rebuilds) — BEFORE any consumer is timed — and the consumers are
    // timed against the warm
    // memos — exactly the cost profile of a real suite session. (Round 10
    // had q102 misclassified as cold: its clearCache reps rebuilt the
    // whole pair table, reporting 5.89 s for a 0.37 s query.) Everything
    // else keeps the best-of-2 cold-pass methodology (clearCache before
    // each rep so a query never reads a prior pass's persisted dedup
    // results; a single timed pass is too exposed to this sandbox's
    // background-load spikes — observed 10x outliers on the heaviest
    // query).
    val memoConsumers = Set(
      "q57_dedup_clusters", "q72_dedup_clusters_stars", "q85_cluster_audit",
      "q102_source_dup_matrix", "q106_keep_one_census", "q109_keep_best",
      // the validity family shares the memoized trained-centroid table
      // (Tables.embeddingCentroids8) — cold-timing each would multi-count
      // the two Lloyd passes, the exact q102 misclassification replayed
      "q165_silhouette", "q168_adjusted_rand", "q169_nmi",
      // the q135 classifier family shares the memoized trained weights
      // (PipelineQueries.sharedClassifierWeights, r20) — cold-timing each
      // would multi-count the identical 4-iteration training seven times
      "q135_classifier_train", "q138_pr_curve", "q143_calibration",
      "q154_roc_auc", "q178_isotonic_calibration", "q181_quantile_transform",
      "q186_quantile_binned",
      // r21 shared inputs (VERDICT r20 items 2-3), same protocol: the
      // dims=32 hashed feature table (Tables.hashedFeaturePairs32;
      // q141 + q147), the bigram-LM CE scores (Tables.bigramCeScores;
      // q117 + q137), and the 8-merge BPE training
      // (PipelineQueries.sharedBpeMerges8; q126 + q127)
      "q141_hashed_classifier", "q147_trained_langid",
      "q117_bigram_lm_ce", "q137_ccnet_buckets",
      "q126_bpe_train", "q127_bpe_apply")
    val extCold = extNames.filterNot(memoConsumers).map { n =>
      // canary BOTH sides of the reps: load arriving mid-leg (after a
      // leading-only sample) produced an unflagged phantom drift
      sampleCanary(n)
      val reps = (1 to 2).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        runOne(n)
      }
      sampleCanary(n)
      n -> reps.min
    }
    // Best-of-2 for the shared builds too (round 11 post-mortem: the one
    // single-pass timing left in the file caught a background-load spike
    // and reported 118 s for a ~1.3 s build). Each rep rebuilds from
    // scratch — clearPairCache drops the memo handles so the builds
    // actually run — and the LAST rep leaves the memos warm for the
    // consumer timings below, exactly as before.
    val sharedLegNames = Seq("shared_pair_table", "shared_component_table",
      "shared_centroid_table", "shared_classifier_weights",
      "shared_hashed_fp32", "shared_bigram_ce", "shared_bpe_merges")
    val sharedReps: Seq[Seq[Double]] = (1 to 2).map { _ =>
      // record under the EMITTED leg names so a flag matches the
      // drift/slow entries it de-noises (review r18: "shared_tables"
      // matched nothing)
      sharedLegNames.foreach(sampleCanary)
      spark.sharedState.cacheManager.clearCache()
      Tables.clearPairCache()
      val marks = Seq.newBuilder[Long]
      marks += System.nanoTime()
      Tables(spark, sfDir).documentNearDupPairs // persists + materializes
      marks += System.nanoTime()
      Tables(spark, sfDir).documentNearDupComponents // one CC run, persisted
      marks += System.nanoTime()
      Tables(spark, sfDir).embeddingCentroids8 // two Lloyd passes, persisted
      marks += System.nanoTime()
      PipelineQueries.sharedClassifierWeights(Tables(spark, sfDir)) // 4 GD passes (r20)
      marks += System.nanoTime()
      Tables(spark, sfDir).hashedFeaturePairs32 // one explode+agg, persisted (r21)
      marks += System.nanoTime()
      Tables(spark, sfDir).bigramCeScores // trained-LM scoring chain, persisted (r21)
      marks += System.nanoTime()
      PipelineQueries.sharedBpeMerges8(Tables(spark, sfDir)) // batched BPE rounds (r21)
      marks += System.nanoTime()
      val ts = marks.result()
      val r = ts.sliding(2).map { case Seq(a, b) => (b - a) / 1e9 }.toSeq
      sharedLegNames.foreach(sampleCanary)
      r
    }
    def sharedBest(i: Int): Double = sharedReps.map(_(i)).min
    val tSharedPairs = sharedBest(0)
    val tSharedComp = sharedBest(1)
    val tSharedCents = sharedBest(2)
    val tSharedClf = sharedBest(3)
    val tSharedFp32 = sharedBest(4)
    val tSharedBgCe = sharedBest(5)
    val tSharedBpe = sharedBest(6)
    val extWarmMemo = extNames.filter(memoConsumers).map { n =>
      sampleCanary(n)
      val best = (1 to 2).map(_ => runOne(n)).min
      sampleCanary(n)
      n -> best
    }
    val ext = (extCold ++ extWarmMemo ++
      Seq("shared_pair_table" -> tSharedPairs,
          "shared_component_table" -> tSharedComp,
          "shared_centroid_table" -> tSharedCents,
          "shared_classifier_weights" -> tSharedClf,
          "shared_hashed_fp32" -> tSharedFp32,
          "shared_bigram_ce" -> tSharedBgCe,
          "shared_bpe_merges" -> tSharedBpe)).sortBy(_._1)

    val qs = serial.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val exts = ext.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failing query must be VISIBLE in the JSON — its near-zero "time"
    // would otherwise report a regression as a speedup
    val failedJson = {
      import scala.jdk.CollectionConverters._
      failed.asScala.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    }
    // Serial-times drift gate (bench twin of scripts/profile_drift.py):
    // compare this run's per-query serial + extension seconds against the
    // previous committed summary (target/bench_summary.json, read BEFORE
    // this run overwrites it). Round 11's shared-memo anomaly was only
    // visible by hand-diffing two JSON tails; the artifact now carries
    // the diff itself. Thresholds per the judge's mandate: flag when the
    // reading moved >2x AND >0.3 s — both directions (a silent 10x
    // "speedup" is usually a query that stopped doing its work).
    val drift: String = {
      val curAll = (serial ++ ext).toMap
      try {
        val basePath = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "target/bench_summary.json"))
        if (!java.nio.file.Files.exists(basePath)) """{"baseline":null}"""
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = om.readTree(java.nio.file.Files.readString(basePath))
          val prevAll = scala.collection.mutable.Map[String, Double]()
          for (sec <- Seq("queries", "extensions"); node = root.get(sec); if node != null) {
            node.fieldNames().forEachRemaining(k => prevAll(k) = node.get(k).asDouble())
          }
          // VERDICT r19 #2: a flagged leg whose neighborhood canary ran
          // hot names its own adjudication — "load, not plan" — right in
          // the entry, so neither driver nor judge has to correlate the
          // canary block by hand (r19 shipped 13 such flags that cost a
          // manual pass to dismiss).
          val contaminated = canaryFlags(canarySamples.toSeq, canaryBase).toSet
          val entries = curAll.keys.toSeq.sorted.flatMap { n =>
            prevAll.get(n).collect {
              case prev if math.abs(curAll(n) - prev) > 0.3 &&
                  (curAll(n) > 2 * prev || prev > 2 * curAll(n)) =>
                val dir = if (curAll(n) > prev) "regressed" else "improved"
                "\"" + n + "\":{\"prev\":" + prev + ",\"cur\":" + curAll(n) +
                  ",\"dir\":\"" + dir + "\",\"canary_contaminated\":" +
                  contaminated.contains(n) + "}"
            }
          }
          s"""{"baseline":"$basePath","flagged":${entries.mkString("{", ",", "}")}}"""
        }
      } catch { case scala.util.control.NonFatal(e) =>
        // the gate must never take down the bench artifact itself
        """{"baseline":"unreadable: """ + e.getClass.getSimpleName + "\"}"
      }
    }

    // Key order matters for artifact durability, not for JSON parsers: the
    // driver's tail capture truncates from the FRONT, so the headline
    // metric/value go LAST on the line (the big per-query maps are what got
    // the round-3 gate number truncated away). The same JSON is also written
    // to target/bench_summary.json so the number survives any truncation.
    // absolute ceiling over EVERY timed reading (serial + extensions +
    // shared builds) — see slowCeilingSec: new pathological queries have
    // no drift baseline, this names them anyway
    val slow = slowJson(serial ++ ext)
    // load-canary annotation: legs whose neighborhood canary ran > 2× the
    // calibrated idle base — read any drift/slow flag on these legs as
    // "machine was loaded", not "plan regressed"
    val canaryJson = {
      val samples = canarySamples.toSeq
      val flagged = canaryFlags(samples, canaryBase)
      val flaggedReadings = flagged.map(n =>
        "\"" + n + "\":" + canarySamples(n)).mkString("{", ",", "}")
      val maxS = if (samples.isEmpty) 0.0 else samples.map(_._2).max
      s"""{"base":$canaryBase,"max_sample":$maxS,""" +
        s""""flagged":${flagged.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""flagged_readings":$flaggedReadings}"""
    }
    // per-pass record: [wall, canary] pairs in run order — min/median
    // spread + canary correlation IS the load-vs-plan call (VERDICT r19 #2)
    val json =
      s"""{"queries":$qs,"serial_total":$serialTotal,"concurrency":$threads,""" +
      s""""extensions":$exts,"drift":$drift,"failed":$failedJson,"slow":$slow,""" +
      s""""canary":$canaryJson,"passes":${passesJson(passSamples)},""" +
      s""""value_best10":$wallBest10,""" +
      s""""sf":"$sfDir","unit":"sec","metric":"suite_wall_concurrent","value":$wall}"""
    val outFile = java.nio.file.Paths.get("target/bench_summary.json")
    java.nio.file.Files.createDirectories(outFile.getParent)
    java.nio.file.Files.write(outFile, json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
