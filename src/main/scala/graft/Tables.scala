package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table catalog over one testdata scale-factor directory.
  *
  * Plays the role of the reference's table-open + metadata step
  * (`shade_ms/ms_info.py :: MSInfo`, `shade_ms/data_plots.py ::
  * get_plot_data` [U]): open the main fact tables plus the small dimension
  * tables. Column pruning and predicate pushdown are left to Catalyst — the
  * parquet scan only reads what downstream plans reference, which is the
  * Spark-native analogue of `xds_from_ms(columns=..., taql=...)`.
  *
  * All loads are lazy `DataFrame`s: nothing is read until an action runs.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Native Catalyst functions (cosine_similarity, …) must exist in the
  // session registry before plans reference them; idempotent.
  graft.plans.GraftFunctions.ensureRegistered(spark)

  /** Schemas are pinned (FIXTURES.md) rather than inferred: skipping the
    * driver-side footer read saves ~90 ms per table construction, and at
    * production scale avoids a listing+footer fetch on every query. */
  private def load(name: String): DataFrame =
    spark.read.schema(Tables.schemas(name)).parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame    = load("region")
  lazy val nation: DataFrame    = load("nation")
  lazy val customer: DataFrame  = load("customer")
  lazy val supplier: DataFrame  = load("supplier")
  lazy val part: DataFrame      = load("part")
  lazy val orders: DataFrame    = load("orders")
  lazy val lineitem: DataFrame  = load("lineitem")
  lazy val documents: DataFrame = load("documents")
  lazy val embeddings: DataFrame = load("embeddings")

  /** `events.parquet` has shipped with BOTH `TIMESTAMP(NANOS)` (rounds 1-8)
    * and `timestamp[us]` (round 9+) physical types, so the `ts` layout is
    * probed from the parquet footer once per directory (memoized JVM-wide)
    * instead of pinned. Nanos files — which Spark 4.x refuses to read
    * natively (`[PARQUET_TYPE_ILLEGAL]`) — are read as long under
    * `nanosAsLong` and truncated to microseconds with integer division
    * (exact: the generator emits µs-precision values; verified equal to
    * DuckDB's native read). Micros files read directly as TimestampType.
    */
  lazy val events: DataFrame = Tables.eventsView(spark, dir)

  /** The MinHash+LSH near-dup pair table over `documents` at the default
    * parameters, memoized per (session, dir): q57, q72 and q85 all
    * consume the IDENTICAL pair set, so a suite session computes the
    * signature+band pipeline once instead of three times (the round-7
    * plan audit measured ~2 s of pure recompute at sf0.1). The result is
    * already persisted+materialized by `minHashNearDups`; the cache owns
    * that handle — consumers must NOT run it through `withPairs` (the
    * unpersist would silently de-cache it for the next query). Bounded:
    * one small-by-LSH-design pair table per scale dir. Long-lived
    * sessions that are done with dedup call [[Tables.clearPairCache]].
    *
    * Resilient to `catalog.clearCache()` (Bench's cold-timing sweeps):
    * a handle whose persist was cleared externally is discarded and the
    * table recomputed+re-persisted, so consumers can never silently run
    * against an unpersisted multi-consumer plan. */
  def documentNearDupPairs: DataFrame =
    Tables.memo(spark, dir, "pairs") { () =>
      graft.operators.Dedup.minHashNearDups(documents, col("doc_id"), col("text"))
    }

  /** The RESOLVED component table `(id, rep)` over
    * [[documentNearDupPairs]], memoized with the same (session, dir)
    * keying and storage-level resilience: q57, q85, q106 and q109 all
    * consume the identical clustering, so a suite session runs the
    * iterative connectedComponents ONCE instead of four times (the
    * round-8 bench measured ~4.5 s of pure CC recompute at sf0.1).
    * `connectedComponents` materializes its result through per-round
    * `localCheckpoint`s, but that storage is invisible to
    * `DataFrame.storageLevel` (cacheManager-based), so the memo persists
    * an explicit handle on top and counts it (eager) — the resilience
    * check then works exactly as for the pair table. q72 deliberately
    * stays OFF this memo: its point is re-resolving the same pair table
    * through the independent large-star/small-star algorithm. */
  def documentNearDupComponents: DataFrame =
    Tables.memo(spark, dir, "components") { () =>
      val comp = graft.operators.Dedup.connectedComponents(documentNearDupPairs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      comp.count() // materialize: every consumer must hit warm storage
      comp
    }

  /** Shared TRAINED CENTROIDS (k = 8, 2 Lloyd rounds over the embeddings)
    * — the third suite-level memoized input: q165 (silhouette), q168
    * (ARI) and q169 (NMI) all audit the IDENTICAL trained clustering, so
    * a suite session runs the two broadcast-assignment Lloyd passes once
    * instead of three times (each pass is a corpus scan + a driver
    * k-row collect — the r16 bench sweep measured ~2 s of pure recompute
    * per consumer at sf0.1). q142 deliberately stays OFF the memo (it IS
    * the gate for the training computation) and so does q160 (it gates
    * the k-means‖-seeded composition, a different trajectory). The
    * trained table is k local rows; the persist handle exists so the
    * memo's storage-level resilience check works unchanged. */
  def embeddingCentroids8: DataFrame =
    Tables.memo(spark, dir, "centroids8") { () =>
      val c = graft.operators.Similarity.trainCentroids(
          embeddings.select(col("vec_id"),
            col("embedding").cast("array<double>").as("e")),
          k = 8, iters = 2, dim = 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      c
    }

  /** Shared HASHED FEATURE-PAIR table at dims = 32
    * ([[graft.operators.TextAnalysis.hashedFeaturePairs]] over the full
    * corpus) — the fifth suite-level memoized input (r21, the r20
    * deferred item 1b): q141 (training AND its `doc_id % 20 == 7`
    * scoring slice — per-id rows, so the slice is a plain filter of
    * this table) and q147 (all five one-vs-rest langid models)
    * featurize the IDENTICAL corpus at the identical dims, so a suite
    * session pays the tokenize+hash explode once instead of three
    * times. Same (session, dir) keying and clearCache resilience as
    * the pair-table memo; Bench times the build as its own
    * `shared_hashed_fp32` entry and times both consumers warm. */
  def hashedFeaturePairs32: DataFrame =
    Tables.memo(spark, dir, "fp32") { () =>
      val fp = graft.operators.TextAnalysis.hashedFeaturePairs(
          documents, col("doc_id"), col("text"), dims = 32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fp.count()
      fp
    }

  /** Shared BIGRAM-LM CROSS-ENTROPY scores
    * ([[graft.operators.TextAnalysis.bigramCrossEntropy]] over the full
    * corpus, target = `lang = 'en'`) — the sixth suite-level memoized
    * input (r21, the r20 deferred item 1b): q117 (the score gate) and
    * q137 (the CCNet bucketing downstream) consume the IDENTICAL
    * trained-LM scoring chain — two corpus explodes + two vocab
    * aggregates + the scoring joins — so a suite session runs it once
    * instead of twice. Bounded: one (id, n_bigrams, ce) row per doc.
    * Bench entry: `shared_bigram_ce`. */
  def bigramCeScores: DataFrame =
    Tables.memo(spark, dir, "bigramCe") { () =>
      val s = graft.operators.TextAnalysis.bigramCrossEntropy(
          documents, col("doc_id"), col("text"),
          isTarget = col("lang") === "en")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count()
      s
    }
}

object Tables {
  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Shared (session, dir, kind)-keyed memo for suite-level derived
    * tables. Resilient to `catalog.clearCache()` (a handle whose persist
    * was cleared externally is discarded and rebuilt), and self-evicting:
    * entries belonging to a STOPPED SparkSession are purged on every
    * call, so a long-lived JVM that churns sessions (test suites) cannot
    * leak stopped sessions' DataFrames through this map. */
  private def memo(spark: SparkSession, dir: String, kind: String)(
      build: () => DataFrame): DataFrame = pairCache.synchronized {
    // NOT ConcurrentHashMap.compute: the components build re-enters this
    // memo for its pair-table input, and compute() is non-reentrant
    // (recursive-update). A monitor is reentrant, and still gives the
    // build-once-per-key guarantee across threads.
    pairCache.keySet.forEach { k =>
      if (k._1.sparkContext.isStopped) { pairCache.remove(k); () }
    }
    val key = (spark, dir, kind)
    val existing = pairCache.get(key)
    if (existing != null &&
        existing.storageLevel != org.apache.spark.storage.StorageLevel.NONE) existing
    else { val built = build(); pairCache.put(key, built); built }
  }

  /** Driver-side twin of [[memo]] for SMALL shared results that live as
    * plain Scala values (r20: the q135-family classifier weights — a
    * 4-double array seven gated queries train identically; see
    * [[graft.PipelineQueries.sharedClassifierWeights]]). Same
    * (session, dir, kind) keying and stopped-session eviction; no
    * storage-level resilience is needed because nothing Spark-managed
    * backs the value. Cleared by [[clearPairCache]] so cold-timing
    * harness reps rebuild it exactly like the DataFrame memos. */
  private val scalarCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), AnyRef]()

  def memoScalar[T <: AnyRef](spark: SparkSession, dir: String, kind: String)(
      build: () => T): T = scalarCache.synchronized {
    scalarCache.keySet.forEach { k =>
      if (k._1.sparkContext.isStopped) { scalarCache.remove(k); () }
    }
    val key = (spark, dir, kind)
    val existing = scalarCache.get(key)
    if (existing != null) existing.asInstanceOf[T]
    else { val built = build(); scalarCache.put(key, built); built }
  }

  /** Release every cached derived table (see
    * [[Tables.documentNearDupPairs]] / [[Tables.documentNearDupComponents]])
    * and every [[memoScalar]] value. */
  def clearPairCache(): Unit = {
    pairCache.values.forEach(df => { df.unpersist(blocking = false); () })
    pairCache.clear()
    scalarCache.clear()
  }

  /** Per-directory memo of the probed `events.ts` physical layout (true =
    * TIMESTAMP(NANOS)). One driver-side footer read per dir per JVM; the
    * file's physical type can't change under a running JVM (the driver
    * regenerates testdata only between rounds). */
  private val eventsNanosByDir =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Probe whether `$dir/events.parquet` stores `ts` as TIMESTAMP(NANOS).
    * Under `nanosAsLong=true`, Spark's footer-based schema inference
    * surfaces a nanos column as LongType and a micros column as
    * TimestampType — a cheap, codec-level discriminator. */
  def eventsTsIsNanos(spark: SparkSession, dir: String): Boolean =
    eventsNanosByDir.computeIfAbsent(dir, _ => {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // a scale dir holds events.parquet among other tables; a stream dir
      // IS the events directory (arbitrary file names) — probe accordingly
      val path =
        if (new java.io.File(s"$dir/events.parquet").exists()) s"$dir/events.parquet"
        else dir
      val inferred = spark.read.parquet(path).schema
      inferred("ts").dataType == LongType
    })

  /** Nanos-era physical schema: `ts` read as raw long under `nanosAsLong`.
    * (lazy: `schemas` is declared below — avoids an init-order null). */
  lazy val eventsSchemaNanos: StructType = StructType(schemas("events").map {
    case f if f.name == "ts" => f.copy(dataType = LongType)
    case f                   => f
  })

  /** The canonical `events` view over a directory: ts is TimestampType at
    * microsecond precision regardless of the file's physical layout
    * (probed — see [[eventsTsIsNanos]]). */
  def eventsView(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    if (eventsTsIsNanos(spark, dir)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.schema(eventsSchemaNanos).parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.schema(schemas("events")).parquet(path)
  }

  /** Streaming twin of [[eventsView]]: a file-source stream over a
    * directory of events parquet, ts normalized identically. The probe
    * runs on the same dir (batch footer read) before the stream starts —
    * but only when a parquet file already exists there: on a still-empty
    * stream directory (files arriving after start) batch schema
    * inference would throw, so the stream falls back to the pinned
    * micros schema (the current generator layout) WITHOUT memoizing, and
    * a later call re-probes once files exist. Limitation (of the probe
    * design, not this fallback): the layout is resolved per directory,
    * so a dir that mixes nanos- and micros-era files would read the
    * minority layout wrong — the driver regenerates testdata whole-dir
    * between rounds, which is exactly the supported shape. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val hasParquet = {
      val fs = new java.io.File(dir).listFiles()
      fs != null && fs.exists(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    if (hasParquet && eventsTsIsNanos(spark, dir)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.readStream.schema(eventsSchemaNanos).parquet(dir)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.readStream.schema(schemas("events")).parquet(dir)
  }

  /** Schema-drift guard: diff every pinned schema against the actual
    * parquet footers under `dir` and fail LOUDLY, naming each divergent
    * column with both types, instead of letting a silently-changed file
    * compute garbage (round 9 lost 11 correctness rows to exactly that:
    * `events.ts` flipped TIMESTAMP(NANOS) → timestamp[us] and the stale
    * nanos view read 2024 data as 1970). Field comparison is by name +
    * dataType, ignoring nullability/metadata; extra columns in the file
    * are fine (pruned), missing ones are drift. One footer read per
    * table — call once per run (Verify does), not per query. */
  def assertSchemasMatch(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val diffs = schemas.keys.toSeq.sorted.flatMap { name =>
      val actual = spark.read.parquet(s"$dir/$name.parquet").schema
      val pinned =
        if (name == "events" && eventsTsIsNanos(spark, dir)) eventsSchemaNanos
        else schemas(name)
      // TIMESTAMP vs TIMESTAMP_NTZ is not drift: the testdata stores NTZ
      // (isAdjustedToUTC=false) and the pinned TimestampType read is
      // bit-identical under the mandated UTC session timezone.
      def norm(dt: DataType): DataType = dt match {
        case TimestampNTZType => TimestampType
        case other            => other
      }
      pinned.flatMap { f =>
        actual.fields.find(_.name == f.name) match {
          case None =>
            Some(s"$name.${f.name}: pinned ${f.dataType.sql}, MISSING from file")
          case Some(a) if norm(a.dataType) != norm(f.dataType) =>
            Some(s"$name.${f.name}: pinned ${f.dataType.sql}, file has ${a.dataType.sql}")
          case _ => None
        }
      }
    }
    if (diffs.nonEmpty) throw new IllegalStateException(
      s"schema drift between pinned Tables.schemas and parquet files in $dir:\n  " +
        diffs.mkString("\n  "))
  }

  /** Pinned logical schemas (FIXTURES.md). `events.ts` is TimestampType —
    * the canonical view type; nanos-era files go through
    * [[eventsSchemaNanos]] + a DIV-1000 normalization instead (see
    * [[eventsView]]). */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))),
  )
}
