package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extension): heuristic language ID, quality scoring, token statistics.
  * All pure column expressions over a long-form token table — fully
  * codegen'd, aggregation-shaped (one shuffle on the group key).
  */
object TextAnalysis {

  /** Stopword lists for the heuristic language classifier. Order matters:
    * ties resolve to the earlier language (mirrored in the oracle CASE). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "de", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "des", "un", "est"))

  /** Per-language stopword-hit score columns over a token column. */
  def langScores(w: Column): Seq[(String, Column)] =
    stopwords.map { case (lang, words) =>
      lang -> sum(when(w.isin(words: _*), 1).otherwise(0))
    }

  /** Argmax with first-wins tie-break over the score columns `s_<lang>`;
    * "unknown" when every score is zero. */
  def predictLang(): Column = {
    val langs = stopwords.map(_._1)
    langs.zipWithIndex.foldRight(lit("unknown")) { case ((lang, i), rest) =>
      val geRest = langs.drop(i + 1)
        .map(l2 => col(s"s_$lang") >= col(s"s_$l2"))
        .foldLeft(col(s"s_$lang") > 0)(_ && _)
      when(geRest, lang).otherwise(rest)
    }
  }

  /** Sub-word unit estimate for a token: BPE-ish `ceil(len/4)`. */
  def subwordCount(w: Column): Column = ceil(length(w) / 4.0).cast("long")

  /** TF-IDF over a long-form token table (doc_id, w): raw term frequency ×
    * `ln(N / df)`. Document frequency always comes from the FULL corpus
    * (`tokens`), even when downstream consumers restrict to a document
    * subset — restrict tf, never df. Returns (doc_id, w, tf, df, tfidf). */
  def tfIdf(tokens: DataFrame, numDocs: Long): DataFrame = {
    val tf = tokens.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tokens.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(df, "w")
      .withColumn("tfidf", col("tf") * log(lit(numDocs.toDouble) / col("df")))
  }
}
