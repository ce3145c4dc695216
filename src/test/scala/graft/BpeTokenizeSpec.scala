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

  test("BpeTrie: longest-match equals a brute-force scan at every position") {
    val trie = graft.plans.BpeTrie(BpeVocab.pieces)
    assert(trie.size == BpeVocab.pieces.size && trie.maxLen == 5)
    val words = Seq("theater", "nation", "xqz", "running", "processing",
      "internationalization", "ationation", "a")
    for (w <- words; pos <- 0 until w.length) {
      val want = BpeVocab.pieces.filter(p => w.startsWith(p, pos))
        .map(_.length).maxOption.getOrElse(0)
      assert(trie.longestMatch(w, pos) == want, s"'$w' @ $pos")
    }
  }

  test("bpe_tokenize_vocab('fixture') is row-identical to bpe_tokenize") {
    val docs = spark.read.schema(Tables.schemas("documents"))
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        TextOps.bpeTokens(col("text")).as("a"),
        TextOps.bpeTokensVocab(col("text"), "fixture").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L, "trie matching must reproduce the fixture scan exactly")
  }

  test("synth32k: production-size vocab, bounded-depth matches") {
    val ps = graft.plans.BpeVocabLarge.pieces
    assert(ps.size > 32000 && ps.size < 40000, s"got ${ps.size}")
    assert(ps.distinct.size == ps.size)
    assert(ps.forall(_.length <= graft.plans.BpeVocabLarge.MaxPieceLen))
    // "theater" = "the" (all-3-char grid; no 4/5-char piece prefixes it)
    // then "ater" (a-initial VCVC grid); "nation" = "nati" (CVCV grid —
    // greedy longest at pos 0 beats the fixture path's "n"+"ation") +
    // "on" — exercises grid pieces, depth bounds, and the big-vocab
    // segmentation genuinely diverging from the fixture's
    val p = Seq("the theater nation").toDF("t")
      .select(TextOps.bpeTokensVocab(col("t"), "synth32k")).as[Seq[String]].head()
    assert(p == Seq("the", "the", "ater", "nati", "on"), s"got $p")
  }

  test("merges file round-trips and a registered file vocab segments identically") {
    import graft.plans.{BpeVocabLarge, BpeVocabs}
    val tmp = java.nio.file.Files.createTempFile("graft-merges", ".txt")
    try {
      BpeVocabLarge.writeMerges(tmp, BpeVocabLarge.pieces)
      assert(BpeVocabLarge.loadMerges(tmp) == BpeVocabLarge.pieces)
      BpeVocabs.registerMerges("spec_file_vocab", tmp)
      val docs = spark.read.schema(Tables.schemas("documents"))
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val diff = docs.select(
          TextOps.bpeTokensVocab(col("text"), "synth32k").as("a"),
          TextOps.bpeTokensVocab(col("text"), "spec_file_vocab").as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0L)
    } finally { java.nio.file.Files.delete(tmp); () }
    intercept[Exception](Seq("x").toDF("t")
      .select(TextOps.bpeTokensVocab(col("t"), "no_such_vocab")).collect())
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
