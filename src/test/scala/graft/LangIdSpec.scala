package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** [[TextAnalysis.langIdTrained]] — discrimination pinned on a fixture
  * the task is LEARNABLE on. The driver corpus cannot show this (its
  * `lang` label is noise over lang-independent text, so the honest
  * argmax there is the majority prior — q147's gate is engine parity);
  * this fixture gives each language a disjoint vocabulary, where the
  * one-vs-rest composition must be exact. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val langs = Seq("aa", "bb", "cc")

  // 120 docs, 40 tokens each, vocabulary disjoint per language; fully
  // deterministic arithmetic construction (no RNG, no Date)
  private lazy val corpus = {
    val rows = (0 until 120).map { i =>
      val l = langs(i % 3)
      val stem = l match { case "aa" => "alpha"; case "bb" => "beta"; case _ => "gamma" }
      val toks = (0 until 40).map(j => s"$stem${(i * 31 + j * 7) % 30}")
      (i.toLong, l, toks.mkString(" "))
    }
    rows.toDF("doc_id", "lang", "text")
  }

  test("disjoint-vocab corpus: trained argmax recovers every label (acc = 1.0)") {
    val got = TextAnalysis.langIdTrained(corpus, col("doc_id"), col("text"),
        col("lang"), langs, dims = 32, iters = 2, lr = 0.5)
      .select(col("id"), col("pred"))
      .join(corpus.select(col("doc_id").as("id"), col("lang")), Seq("id"))
      .collect()
    assert(got.length == 120, s"one prediction per doc expected, got ${got.length}")
    val wrong = got.filter(r => r.getAs[String]("pred") != r.getAs[String]("lang"))
    assert(wrong.isEmpty,
      s"${wrong.length} misclassified, e.g. ${wrong.take(3).toSeq}")
  }

  test("NULL-lang docs train as the 0.0 otherwise-arm for every candidate and still score") {
    // the shared label table factored out in round 14 must preserve the
    // original per-model `when(lang === l, 1).otherwise(0)` semantics:
    // a NULL lang is 0.0 for EVERY one-vs-rest model (the otherwise
    // arm), not dropped from training — pinned by exact output parity
    // with the same corpus relabeled to a non-candidate sentinel, which
    // takes the identical otherwise-arm everywhere by construction.
    // The driver fixture has no NULL langs, so this edge lives here.
    val withNull = corpus.withColumn("lang",
      when(col("doc_id") % 7 === 0, lit(null: String)).otherwise(col("lang")))
    val sentinel = corpus.withColumn("lang",
      when(col("doc_id") % 7 === 0, lit("zz")).otherwise(col("lang")))
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.langIdTrained(df, col("doc_id"), col("text"),
        col("lang"), langs, dims = 32, iters = 2, lr = 0.5)
        .select("id", "pred", "z6").as[(Long, String, Double)].collect().toSet
    val a = run(withNull)
    assert(a == run(sentinel),
      "NULL lang must train exactly as any non-candidate label (the otherwise arm)")
    assert(a.map(_._1) == (0L until 120L).toSet,
      "every doc, null-lang included, must still receive a prediction")
  }

  test("unknown candidate never wins against a trained one; ties break by name") {
    // add a candidate with NO positive docs: its model trains toward
    // never-predict and must not beat the true language anywhere
    val got = TextAnalysis.langIdTrained(corpus, col("doc_id"), col("text"),
        col("lang"), langs :+ "zz", dims = 32, iters = 2, lr = 0.5)
      .select(col("pred")).as[String].collect()
    assert(!got.contains("zz"), "a positive-free candidate must never win")
    intercept[IllegalArgumentException] {
      TextAnalysis.langIdTrained(corpus, col("doc_id"), col("text"),
        col("lang"), Seq("aa", "aa"), dims = 32, iters = 1, lr = 0.5)
    }
  }
}
