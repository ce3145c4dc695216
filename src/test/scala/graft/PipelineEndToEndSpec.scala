package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Dedup, Sampling}
import graft.sources.Formats

/** The whole training-data pipeline, end to end, on real fixture docs:
  * text-format ingest → quality gate → near-dup pairs → cluster
  * resolution → keep-one-per-cluster → exact-substring span removal
  * (duplicatedSpans feed, r20) → stratified sample → partitioned
  * columnar write. Each stage is an operator this library ships; the
  * test asserts the invariants a corpus build actually relies on.
  */
class PipelineEndToEndSpec extends SparkSpec {

  private val tmp = "/tmp/graft-pipeline-e2e"

  test("ingest → clean → dedup → sample → partitioned write, invariants end to end") {
    val docs = sf0001.documents

    // 1. ingest: the corpus arrives as a CSV drop, schema pinned
    Formats.writeCsv(docs, s"$tmp/drop")
    val ingested = Formats.readCsv(spark, s"$tmp/drop", Tables.schemas("documents"))
    assert(ingested.count() == docs.count())

    // 2. quality gate (keep side only; rejects are auditable separately)
    val cleaned = Cleaning.clean(ingested, col("text"))
    val nCleaned = cleaned.count()
    assert(nCleaned > 0 && nCleaned <= docs.count())

    // 3. near-dup pairs → connected components → drop every non-representative
    val pairs = Dedup.minHashNearDups(cleaned, col("doc_id"), col("text"))
    val deduped = Dedup.withPairs(pairs) { p =>
      Dedup.dropNearDups(cleaned, col("doc_id"), p)
    }
    val nDeduped = deduped.count()
    assert(nDeduped < nCleaned, "the fixture corpus contains near-dups; some must drop")
    // invariant: the kept set has no remaining near-dup pair
    val residual = Dedup.withPairs(
      Dedup.minHashNearDups(deduped, col("doc_id"), col("text")))(_.count())
    assert(residual == 0, s"kept set must be pair-free, found $residual residual pairs")

    // 4. exact-substring removal (the Lee et al. dedup step), fed from
    // the SPAN report — the default removal feed since r20 (VERDICT r19
    // #3): duplicatedSpans is linear at any skew and needs no df-cap,
    // where the pair join (kept for q88's pairwise gate) needs the
    // stop-shingle escape hatch on Zipfian corpora. Every occurrence of
    // every cross-document verbatim run is excised; the
    // corpus is rebuilt by patching affected docs only. minRun = 5:
    // the fixture survivors' residual boilerplate runs are short (the
    // near-dup drop already took the long ones with their documents) —
    // 14 spans at 5, zero at >= 6, measured r20.
    val spans = Dedup.duplicatedSpans(deduped, col("doc_id"), col("text"), minRun = 5)
      .withColumnRenamed("pos", "pos_train")
    assert(spans.count() > 0,
      "near-dup survivors still share sub-threshold boilerplate spans in the fixtures")
    val patched = Dedup.removeSubstringRuns(
      deduped, col("doc_id"), col("text"), spans)
    val spanned = deduped
      .join(patched.select(col("doc_id"), col("text_clean")), Seq("doc_id"), "left")
      .withColumn("text", coalesce(col("text_clean"), col("text")))
      .drop("text_clean")
    assert(spanned.count() == nDeduped, "removal patches text; it never drops docs")
    // zero-residual invariant (same discipline as the pair-free check
    // above): re-running the span detector over the rebuilt corpus at
    // the same parameters finds nothing
    val residualSpans = Dedup.duplicatedSpans(
      spanned, col("doc_id"), col("text"), minRun = 5).count()
    assert(residualSpans == 0,
      s"span-cleaned corpus must be span-free, found $residualSpans residual spans")

    // 5. deterministic stratified sample by language
    val rates = Map("en" -> 1.0, "es" -> 0.5, "de" -> 0.5, "fr" -> 0.5, "it" -> 0.5)
    val sampled = Sampling.stratifiedHashSample(
      spanned, col("doc_id"), col("lang"), rates)
    val perLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullLang = spanned.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.getOrElse("en", 0L) == fullLang.getOrElse("en", 0L),
      "rate-1.0 stratum keeps everything")
    perLang.keys.filter(_ != "en").foreach { l =>
      assert(perLang(l) <= fullLang(l)) // subsampled strata shrink
    }

    // 6. columnar home, partitioned by the iteration key
    sampled.write.mode("overwrite").partitionBy("lang").parquet(s"$tmp/home")
    val home = spark.read.parquet(s"$tmp/home")
    assert(home.count() == sampled.count())
    // partition pruning: a lang filter must read only that partition
    val pruned = home.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"lang filter must prune partitions:\n$scan")
    assert(pruned.count() == perLang.getOrElse("en", 0L))
  }

  test("day 2: incremental batch → dedup vs corpus signatures → decontaminate → append") {
    // day 1 leaves behind the corpus and its signature table (the
    // convention incrementalNearDups is built around); day 2 processes a
    // NEW batch without ever re-reading the corpus text
    val docs = sf0001.documents
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    Dedup.minHashSignaturesNative(corpus, col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$tmp/sigs")

    // 1. dedup the batch against the persisted signature table
    val (pairs, updated) = Dedup.incrementalNearDups(
      batch, col("doc_id"), col("text"), spark.read.parquet(s"$tmp/sigs"))
    // drop policy: any batch doc in a >= 0.9 pair goes (vs a corpus match
    // the corpus copy wins; an intra-batch twin pair conservatively drops
    // both — keep-one via dropNearDups is the batch-mode alternative)
    val dupIds = pairs.filter(col("est") >= 0.9)
      .select(explode(array(col("da"), col("db"))).as("doc_id"))
      .join(batch.select("doc_id"), "doc_id")
      .distinct()
    val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti")
    pairs.unpersist()

    // 2. decontaminate the survivors against the benchmark suite
    // (doc_id % 7 == 0 plays the eval set, as in q74), normalized so a
    // re-punctuated answer cannot slip through
    val evalDocs = docs.filter(col("doc_id") % 7 === 0)
    val contaminated = Dedup.crossContamination(
      survivors, evalDocs, col("doc_id"), col("text"), n = 8, normalize = true)
    val admitted = survivors.join(
      contaminated.select("doc_id"), Seq("doc_id"), "left_anti")

    // invariants a daily ingest relies on
    assert(batch.count() > 0 && admitted.count() <= batch.count())
    // no admitted doc near-dups the corpus at the drop threshold: re-running
    // the incremental detector over the admitted set finds nothing >= 0.9
    val (recheck, _) = Dedup.incrementalNearDups(
      admitted, col("doc_id"), col("text"), spark.read.parquet(s"$tmp/sigs"))
    val residual = recheck.filter(col("est") >= 0.9).count()
    recheck.unpersist()
    assert(residual == 0, s"admitted batch must be dup-free vs the corpus, found $residual")
    // no admitted doc shares a normalized 8-gram with the eval suite
    assert(Dedup.crossContamination(
        admitted, evalDocs, col("doc_id"), col("text"), n = 8, normalize = true)
      .count() == 0, "admitted batch must be decontaminated")
    // the signature table moves forward: updated = old ∪ batch signatures
    assert(updated.count() ==
      spark.read.parquet(s"$tmp/sigs").count() + batch.count())
  }
}
