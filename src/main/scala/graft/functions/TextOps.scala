package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization / shingling primitives for the text-pipeline operators
  * (north-star extension surface; the reference has no text analytics).
  * Everything is built from Spark's codegen'd string/array built-ins and
  * higher-order functions — no UDFs in the hot path.
  */
object TextOps {

  /** Lowercased whitespace tokens (may contain empty strings on double
    * spaces — callers filter). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Text normalization for training-data cleaning: lowercase, strip
    * non-alphanumerics to spaces, collapse runs of whitespace, trim.
    * Pure codegen'd string expressions. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Unicode normalization via the native `unicode_normalize` expression
    * ([[graft.plans.UnicodeNormalize]]; forms NFC/NFD/NFKC/NFKD) — the
    * canonical first cleaning step: composed-vs-decomposed byte variants
    * of the same text defeat exact dedup, MinHash shingles and stopword
    * matches unless normalized BEFORE hashing. Codegen'd (stays inside
    * the scan's whole-stage span); already-normalized rows return the
    * input string without allocating. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    graft.plans.GraftFunctions.unicodeNormalize(text, form)

  /** Remove stopwords from a token array (higher-order filter — no
    * explode/regroup round trip). */
  def removeStopwords(toks: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    filter(toks, t => !array_contains(sw, t))
  }

  /** REAL subword tokenization via the native `bpe_tokenize` expression
    * ([[graft.plans.BpeTokenize]]): WordPiece-style greedy longest-match
    * segmentation of every whitespace word against the
    * [[graft.plans.BpeVocab]] fixture merges, single-char fallback for
    * unknown prefixes. The accurate sibling of
    * `TextAnalysis.subwordCount`'s `ceil(len/4)` heuristic for token
    * budgeting — swap the fixture for a learned vocab and the counts are
    * production BPE. Returns `array<string>` of pieces in document order. */
  def bpeTokens(text: Column): Column =
    graft.plans.GraftFunctions.bpeTokenize(text)

  /** Subword piece count of a document under [[bpeTokens]] — a drop-in
    * for the chunking/packing/budget operators' heuristic counts. */
  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast("long")

  /** [[bpeTokens]] against a REGISTERED vocabulary id
    * ([[graft.plans.BpeVocabs]]) — same segmentation contract, trie
    * matching bounded by the vocab's max piece length, so a
    * production-size (32k+) vocab costs the same per position as the
    * 60-entry fixture. Built-ins: `"fixture"`, `"synth32k"`; merges
    * files register via [[graft.plans.BpeVocabs.registerMerges]]. */
  def bpeTokensVocab(text: Column, vocabId: String): Column =
    graft.plans.GraftFunctions.bpeTokenizeVocab(text, vocabId)

  /** Token n-gram shingles as an array column (empty when the doc has
    * fewer than `n` tokens). `element_at` is 1-based; the shingle set is
    * identical to the oracle's `s[i] || ' ' || s[i+1] || ...` (1-based).
    *
    * This is the composed (higher-order-function) form, kept as the
    * independent cross-check for [[shinglesNative]]; HOF lambdas evaluate
    * interpreted (no codegen), so hot paths use the native expression. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Identical shingle array via the native `word_ngrams` expression
    * ([[graft.plans.TextHashExpressions.WordNGrams]]) — one JVM loop per
    * row instead of an interpreted lambda per element (~10× on shingle-
    * heavy scans). Equality with [[shingles]] pinned in
    * NativeHashParitySpec. */
  def shinglesNative(toks: Column, n: Int): Column =
    graft.plans.GraftFunctions.wordNGrams(toks, n)
}
