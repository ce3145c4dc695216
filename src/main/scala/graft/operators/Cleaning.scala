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

  /** Strip markup tags (`<...>`) to spaces and collapse whitespace — the
    * boilerplate-removal step for HTML-scraped corpora. Codegen'd string
    * built-ins only; the tag pattern is RE2-safe (no backtracking
    * constructs) so the identical regex runs on Java and RE2 engines. */
  def stripMarkup(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "<[^>]*>", " "), "\\s+", " "))

  /** Redact common PII patterns (emails, phone-like digit groups) with
    * typed placeholders — the redact-on-ingest stage of a training-data
    * pipeline (redact BEFORE any write: once a blob lands in the lake the
    * copy is out of your control). Patterns are RE2-safe. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(
      text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    regexp_replace(email, "\\b\\d{3}[-.]\\d{4}\\b", "[PHONE]")
  }
}
