package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.plans.{BpeVocab, GraftFunctions}

class BpeTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def pieces(text: String): Seq[String] =
    Seq(text).toDF("t").select(TextOps.bpeTokens(col("t"))).as[Seq[String]].head()

  test("bpe_tokenize: golden greedy longest-match segmentations") {
    // whole-word vocab hit
    assert(pieces("the") == Seq("the"))
    // longest-first: "the" beats "th"/"te"; then "ate"; char fallback
    assert(pieces("theater") == Seq("the", "ate", "r"))
    // char fallback first, then the 5-char "ation" beats "at"/"ate"
    assert(pieces("nation") == Seq("n", "ation"))
    // fully out-of-vocab word: all single-char fallbacks
    assert(pieces("xqz") == Seq("x", "q", "z"))
    // mixed: fallback, "un", fallback, suffix merge
    assert(pieces("running") == Seq("r", "un", "n", "ing"))
    // prefix merge then mixed fallbacks
    assert(pieces("processing") == Seq("pro", "c", "es", "s", "ing"))
  }

  test("bpe_tokenize: document-level split/lowercase/empty-word semantics") {
    // pieces concatenate across words in order
    assert(pieces("the running") == Seq("the", "r", "un", "n", "ing"))
    // lowercased exactly like TextOps.tokens
    assert(pieces("The NATION") == Seq("the", "n", "ation"))
    // double space -> empty word contributes zero pieces
    assert(pieces("a  b") == Seq("a", "b"))
    // empty document -> empty piece array (not null)
    assert(pieces("") == Seq.empty)
    // NULL stays NULL
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextOps.bpeTokens(col("t"))).collect()
    assert(n.head.isNullAt(0))
    // count surface
    val c = Seq("the running").toDF("t")
      .select(TextOps.bpeTokenCount(col("t"))).as[Long].head()
    assert(c == 5L)
  }

  test("BpeVocab contract: lowercase multi-char pieces, SQL values in sync") {
    assert(BpeVocab.pieces.forall(p => p.length >= 2 && p == p.toLowerCase))
    assert(BpeVocab.pieces.distinct == BpeVocab.pieces)
    // the oracle-side relation quotes every piece, same order, same count
    assert(BpeVocab.sqlValues ==
      BpeVocab.pieces.map(p => s"('$p')").mkString("(VALUES ", ",", ")"))
    // no piece needs SQL escaping (would silently corrupt the oracle)
    assert(BpeVocab.pieces.forall(p => !p.contains("'")))
  }

  test("bpe_tokenize registers in SQL and rejects wrong arity/type") {
    GraftFunctions.ensureRegistered(spark)
    val viaSql = spark.sql(
      "SELECT bpe_tokenize('the running') AS p").as[Seq[String]].head()
    assert(viaSql == Seq("the", "r", "un", "n", "ing"))
    intercept[Exception](spark.sql("SELECT bpe_tokenize('a', 'b')").collect())
    intercept[Exception](spark.sql("SELECT bpe_tokenize(array(1))").collect())
  }
}
