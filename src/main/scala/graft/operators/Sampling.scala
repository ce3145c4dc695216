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

  /** Uniform bucket in [0, 65536) from the md5 hex of the key. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Cutoff bucket for a fraction (rounded to the nearest 1/65536). */
  private def cutoff(fraction: Double): Int = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    math.round(fraction * 65536.0).toInt
  }

  /** Keep ~`fraction` of rows, selected deterministically by `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashBucket(key) < lit(cutoff(fraction)))

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
}
