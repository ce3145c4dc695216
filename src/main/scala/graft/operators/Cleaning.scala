package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Corpus-cleaning stage for training-data pipelines (north-star surface):
  * normalize → tokenize → quality-gate, as one declarative pass. Each
  * filter is a plain predicate (pushdown-friendly); rejected rows can be
  * routed to a quarantine output instead of dropped, so the pipeline is
  * auditable — at 100 TB you want to know *what* you threw away.
  */
object Cleaning {

  /** Quality thresholds for [[clean]]. */
  final case class Thresholds(
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      minTypeTokenRatio: Double = 0.1,
      minMeanTokenLen: Double = 2.0,
      maxMeanTokenLen: Double = 20.0)

  /** Adds normalization + quality columns: `norm_text`, `toks`, `n_tok`,
    * `ttr`, `mean_len`, and the boolean `keep`. */
  def withQuality(df: DataFrame, text: Column, t: Thresholds = Thresholds()): DataFrame =
    df.withColumn("norm_text", TextOps.normalizeText(text))
      .withColumn("toks", filter(split(col("norm_text"), " "), x => x =!= ""))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("ttr", size(array_distinct(col("toks"))) / col("n_tok").cast("double"))
      .withColumn("mean_len",
        aggregate(col("toks"), lit(0), (acc, w) => acc + length(w)) / col("n_tok").cast("double"))
      .withColumn("keep",
        col("n_tok").between(t.minTokens, t.maxTokens) &&
        col("ttr") >= t.minTypeTokenRatio &&
        col("mean_len").between(t.minMeanTokenLen, t.maxMeanTokenLen))

  /** The keep-side of the gate (drop the working columns). */
  def clean(df: DataFrame, text: Column, t: Thresholds = Thresholds()): DataFrame =
    withQuality(df, text, t).filter(col("keep"))
      .drop("toks", "n_tok", "ttr", "mean_len", "keep")

  /** The quarantine side — rejected rows with their quality metrics, for
    * auditing what the gate removed. */
  def rejected(df: DataFrame, text: Column, t: Thresholds = Thresholds()): DataFrame =
    withQuality(df, text, t).filter(!col("keep")).drop("toks", "keep")
}
