package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * `df.sample(fraction)` is seeded per-partition: the selected rows change
  * whenever the partitioning does (a repartition, a file split change, a
  * cluster resize), which makes pipeline runs unreproducible. Hash
  * sampling decides per ROW — keep a row iff a hash of its stable key
  * falls under the fraction cutoff — so the same rows are selected on any
  * engine, any partitioning, any run. It is also a plain predicate:
  * no shuffle, no RNG state, pushdown-friendly, and composable with
  * stratification (a different cutoff per stratum).
  *
  * The hash is the first 16 bits of `md5(key)` — md5 is bit-identical
  * across Spark / DuckDB / Python, so a sample drawn here can be
  * reproduced exactly by any downstream or oracle system.
  */
object Sampling {

  /** Uniform bucket in [0, 65536) from the md5 hex of the key.
    *
    * Semantics that follow from hashing the KEY (both deliberate):
    *  - rows with EQUAL keys land in the same bucket, so they are kept or
    *    dropped together — sample by entity, not by row (pick a row-unique
    *    key for row-level sampling);
    *  - NULL keys are one such entity (hashed via a sentinel rather than
    *    propagating NULL, which would silently drop every null-key row
    *    from the sample regardless of fraction). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(coalesce(key.cast("string"), lit("\u0000null"))), 1, 4), 16, 10)
      .cast("int")

  /** Cutoff bucket for a fraction (rounded to the nearest 1/65536). */
  private def cutoff(fraction: Double): Int = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    math.round(fraction * 65536.0).toInt
  }

  /** Keep ~`fraction` of rows, selected deterministically by `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashBucket(key) < lit(cutoff(fraction)))

  /** Deterministic TRAIN/VAL/TEST split — the assignment every ML
    * pipeline makes before anything else, done the only way that
    * survives re-runs, engine changes and repartitioning: contiguous
    * [[hashBucket]] ranges. Split i owns buckets `[cum_{i-1}, cum_i)`
    * where the cumulative cut is rounded to 1/65536 (cumulative THEN
    * rounded, so per-split rounding cannot drift the total); fractions
    * must sum to 1, so the last cut is exactly 65536 and every row gets
    * a label. A pure labeling projection — no shuffle, no sampling
    * nondeterminism, and a doc's split never changes as the corpus
    * grows (the property `df.randomSplit` does NOT have). Order of
    * `splits` is part of the contract (it defines the ranges). */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    splits.foreach { case (n, f) =>
      require(f > 0.0 && f <= 1.0, s"split '$n' fraction $f out of (0,1]") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => cutoff(math.min(1.0, c))) // cumulative, then round; clamp fp drift
    val b = hashBucket(key)
    val label = splits.zip(cums).reverse.foldLeft(lit(splits.last._1)) {
      case (rest, ((name, _), cum)) => when(b < cum, name).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Stratified variant: per-stratum fractions (strata not listed are
    * dropped). One predicate, no shuffle — the per-stratum cutoff is a
    * CASE over the stratum column. */
  def stratifiedHashSample(
      df: DataFrame, key: Column, stratum: Column,
      fractions: Map[String, Double]): DataFrame = {
    val cut = fractions.foldLeft(lit(-1)) { case (acc, (s, f)) =>
      when(stratum === lit(s), lit(cutoff(f))).otherwise(acc)
    }
    df.filter(hashBucket(key) < cut)
  }

  /** MIXTURE sampling to a token budget — the corpus-composition step of
    * a training run: given target mixture weights per stratum (domain,
    * language, source) and a total token budget, keep a deterministic
    * sample of each stratum sized so it contributes ≈ weight × budget
    * tokens. Unlike [[stratifiedHashSample]] the per-stratum rate is not
    * given, it is DERIVED FROM THE DATA: rate_s = min(1, weight_s ×
    * budget / stratumTokens_s), so the same call rebalances any corpus
    * toward the target mixture (an over-represented stratum is sampled
    * down, an under-represented one is kept whole — it cannot be
    * upsampled past 1.0).
    *
    * Determinism and oracle-portability: the cutoff is quantized to
    * 1/65536 with PURE INTEGER arithmetic — `weightPerMille × budget ×
    * 65536 DIV (1000 × total)` at decimal(38,0), never a double — so an
    * engine-vs-oracle one-ULP difference cannot flip a row near the
    * cutoff boundary, at any corpus size.
    *
    * Shuffle shape: one tiny aggregate (|strata| rows) for the totals,
    * broadcast back as the cutoff table; the kept-row decision is then a
    * per-row hash predicate, exactly like the other samplers. Strata
    * without a weight are dropped — including the NULL stratum, which
    * groups under the sentinel `"__null__"` (mirroring [[hashBucket]]'s
    * deliberate null-key handling): give `"__null__"` a weight to keep
    * an unlabeled slice (e.g. unidentified-language docs), omit it to
    * drop that slice explicitly rather than silently. */
  /** TEMPERATURE-reweighted mixture plan — derives the per-stratum
    * target weights [[tokenBudgetSample]] consumes, instead of taking
    * them as given. The standard multilingual/multi-source recipe
    * (mT5/XLM-R style): sample strata proportional to `p_s^α` where
    * `p_s` is the stratum's natural token share and `α ∈ (0, 1]` the
    * temperature — α = 1 keeps the natural mixture, α → 0 flattens
    * toward uniform, anything between boosts the tail without drowning
    * the head. Returns one report row per stratum: natural share `p`,
    * reweighted share `w = p^α / Σ p^α`, the token target under
    * `budgetTokens`, and `epochs` = target/available — the upsampling
    * factor a loader must apply (> 1 means the stratum repeats; the
    * signal [[tokenBudgetSample]]'s keep-only-downsampling clamps away).
    *
    * Shuffle shape at 100 TB: ONE |strata|-row aggregate; every
    * normalization after it is 1-row-broadcast cross-join arithmetic on
    * report-sized data (the q94/q98 totals discipline). NULL strata
    * group under the `"__null__"` sentinel exactly like
    * [[tokenBudgetSample]]. Cross-engine: shares and `pow` evaluate on
    * identical doubles in both engines (counts are exact longs; the
    * division/power expression trees mirror the oracle's), the q94
    * association-mirroring precedent. */
  def temperatureMixture(
      df: DataFrame, stratum: Column, tokenCount: Column,
      alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    val st = coalesce(stratum.cast("string"), lit("__null__"))
    val t = df.groupBy(st.as("stratum"))
      .agg(sum(tokenCount).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0L)
    val total = t.agg(sum("n_tokens").as("__tm_total"))
    val pa = t.crossJoin(broadcast(total))
      .withColumn("p", col("n_tokens") / col("__tm_total"))
      .withColumn("__tm_pa", pow(col("p"), lit(alpha)))
    val z = pa.agg(sum("__tm_pa").as("__tm_z"))
    pa.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_tokens"), col("p"),
        (col("__tm_pa") / col("__tm_z")).as("w"),
        (lit(budgetTokens.toDouble) * col("__tm_pa") / col("__tm_z"))
          .as("target_tokens"),
        (lit(budgetTokens.toDouble) * col("__tm_pa") / col("__tm_z") /
          col("n_tokens")).as("epochs"))
  }

  def tokenBudgetSample(
      df: DataFrame, key: Column, stratum: Column, tokenCount: Column,
      weightsPerMille: Map[String, Int], budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens must be >= 0, got $budgetTokens")
    weightsPerMille.foreach { case (s, w) =>
      require(w >= 0 && w <= 1000, s"weight for '$s' must be in [0,1000] per-mille, got $w") }
    val w = weightsPerMille.foldLeft(lit(null).cast("long")) { case (acc, (s, v)) =>
      when(col("__stratum") === lit(s), lit(v.toLong)).otherwise(acc)
    }
    // NULL strata coalesce to a sentinel so they are weight-addressable;
    // a raw equi-join on a NULL key would drop unlabeled rows silently
    val st = coalesce(stratum.cast("string"), lit("__null__"))
    val cuts = df.groupBy(st.as("__stratum"))
      .agg(sum(tokenCount).as("__tot"))
      .select(col("__stratum"), w.as("__w"), col("__tot"))
      .filter(col("__w").isNotNull && col("__tot") > 0L)
      .select(col("__stratum"),
        least(lit(65536L), expr(
          s"CAST(__w AS DECIMAL(38,0)) * $budgetTokens * 65536 DIV " +
          "(1000 * CAST(__tot AS DECIMAL(38,0)))")).as("__cut"))
    df.join(broadcast(cuts), st === col("__stratum"))
      .filter(hashBucket(key) < col("__cut"))
      .drop("__stratum", "__cut")
  }

  /** WEIGHTED sampling WITHOUT replacement — Efraimidis–Spirakis (2006),
    * the one-pass distributed answer to "draw k documents per stratum
    * with probability proportional to weight, no duplicates" (quality-
    * weighted corpus subsetting, weighted eval-set draws — where
    * [[hashSample]] is uniform and [[temperatureMixture]] reweights
    * whole strata, this picks INDIVIDUAL rows by weight). Each row draws
    * the deterministic uniform `u = (md5_20bit(seed|key) + 1) / 2^20`
    * ∈ (0, 1] and scores `wkey = ln(u) / w` — the log of the classic
    * `u^(1/w)` key, same ordering; the per-stratum top-k by `wkey` IS a
    * weight-proportional sample without replacement (Efraimidis–
    * Spirakis Thm 1). Deterministic: same seed → same sample on any
    * partitioning/engine; a different seed is an independent redraw —
    * the [[hashSample]]/[[Layout.seededShuffle]] reproducibility
    * contract, which `orderBy(rand())`-style sampling has none of.
    *
    * Rows with NULL or non-positive weight are EXCLUDED (a zero-weight
    * row has selection probability 0; silently keeping them would make
    * the "proportional to weight" claim false). Ranking uses the
    * 9-decimal ROUNDED key with the key column as tie-break (the q94
    * limit-boundary discipline — `ln` is the only libm call, mirrored
    * verbatim by the oracle). Shuffle shape: ONE window exchange on the
    * stratum key — the map side carries only md5 + ln arithmetic.
    * Appends `(wkey9, rn)`; `k ≥ stratum size` degenerates to "all
    * rows, weight-ranked" (the spec anchor). */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      stratum: Column, k: Int, seed: String = "wsamp"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (conv(substring(md5(concat(lit(s"$seed|"), key.cast("string"))), 1, 5), 16, 10)
      .cast("long") + lit(1L)).cast("double") / lit(1048576.0)
    val wkey = graft.functions.Rounding.portable(log(u) / weight.cast("double"), 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__ws_stratum").orderBy(col("wkey9").desc, key)
    df.filter(weight.isNotNull && weight.cast("double") > 0.0)
      .withColumn("__ws_stratum", coalesce(stratum.cast("string"), lit("__null__")))
      .withColumn("wkey9", wkey)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .drop("__ws_stratum")
  }
}
