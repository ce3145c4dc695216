package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration of graft's native Catalyst functions.
  *
  * Two paths, same registry entries:
  *  - cluster deployment: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection point);
  *  - programmatic/local: [[GraftFunctions.ensureRegistered]] (idempotent),
  *    called by the engine before building plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def literalInt(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"cosine_similarity requires exactly 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(
        classOf[TextHashExpressions.MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"minhash_signature(tokens, shingleN, numHashes) takes 3 arguments, got ${exprs.length}")
        TextHashExpressions.MinHashSignature(exprs.head,
          literalInt(exprs(1), "minhash_signature", "shingleN"),
          literalInt(exprs(2), "minhash_signature", "numHashes"))
      }),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(
        classOf[TextHashExpressions.SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"simhash32(tokens, shingleN) takes 2 arguments, got ${exprs.length}")
        TextHashExpressions.SimHash32(exprs.head,
          literalInt(exprs(1), "simhash32", "shingleN"))
      }),
    (FunctionIdentifier("top_run"),
      new ExpressionInfo(
        classOf[TextHashExpressions.TopRun].getName, "top_run"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"top_run(sortedArr) takes 1 argument, got ${exprs.length}")
        TextHashExpressions.TopRun(exprs.head)
      }),
    (FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(
        classOf[TextHashExpressions.WordNGrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"word_ngrams(tokens, n) takes 2 arguments, got ${exprs.length}")
        TextHashExpressions.WordNGrams(exprs.head,
          literalInt(exprs(1), "word_ngrams", "n"))
      }),
    (FunctionIdentifier("srp_bands"),
      new ExpressionInfo(
        classOf[TextHashExpressions.SrpBands].getName, "srp_bands"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 5) throw new IllegalArgumentException(
          s"srp_bands(vec, tables, bandBits, dim, seed) takes 5 arguments, got ${exprs.length}")
        TextHashExpressions.SrpBands(exprs.head,
          literalInt(exprs(1), "srp_bands", "tables"),
          literalInt(exprs(2), "srp_bands", "bandBits"),
          literalInt(exprs(3), "srp_bands", "dim"),
          literalInt(exprs(4), "srp_bands", "seed").toLong)
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(
        classOf[TextHashExpressions.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"simhash64(tokens, shingleN) takes 2 arguments, got ${exprs.length}")
        TextHashExpressions.SimHash64(exprs.head,
          literalInt(exprs(1), "simhash64", "shingleN"))
      }),
    (FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_distance"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"l2_distance requires exactly 2 arguments, got ${exprs.length}")
        L2Distance(exprs.head, exprs(1))
      }),
    // Spark ships BloomFilterAggregate / BloomFilterMightContain for its
    // internal runtime-filter injection but does NOT register them in the
    // public FunctionRegistry; surfacing them here gives the exact-dup
    // incremental guard (Dedup.exactDupsAgainstCorpus) a codegen'd,
    // sketch-library-backed bloom path with no new code.
    (FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"bloom_filter_agg(xxhash64Value, estimatedItems, numBits) takes 3 arguments, got ${exprs.length}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, exprs(1), exprs(2))
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"bloom_might_contain(bloomBinary, xxhash64Value) takes 2 arguments, got ${exprs.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
      }),
    (FunctionIdentifier("bpe_tokenize"),
      new ExpressionInfo(classOf[BpeTokenize].getName, "bpe_tokenize"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"bpe_tokenize(text) takes 1 argument, got ${exprs.length}")
        BpeTokenize(exprs.head)
      }),
    (FunctionIdentifier("bpe_apply_merges"),
      new ExpressionInfo(classOf[BpeApplyMerges].getName, "bpe_apply_merges"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"bpe_apply_merges(text, vocabId) takes 2 arguments, got ${exprs.length}")
        val id = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"bpe_apply_merges: vocabId must be a string literal, got $other")
        }
        BpeApplyMerges(exprs.head, id)
      }),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"unicode_normalize(text, form) takes 2 arguments, got ${exprs.length}")
        val form = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize: form must be a string literal, got $other")
        }
        UnicodeNormalize(exprs.head, form)
      }),
    (FunctionIdentifier("luhn_mask_cards"),
      new ExpressionInfo(classOf[LuhnMaskCards].getName, "luhn_mask_cards"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"luhn_mask_cards(text) takes 1 argument, got ${exprs.length}")
        LuhnMaskCards(exprs.head)
      }),
    (FunctionIdentifier("luhn_count_cards"),
      new ExpressionInfo(classOf[LuhnCountCards].getName, "luhn_count_cards"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"luhn_count_cards(text) takes 1 argument, got ${exprs.length}")
        LuhnCountCards(exprs.head)
      }),
    (FunctionIdentifier("hilbert_xy2d"),
      new ExpressionInfo(classOf[HilbertXY2D].getName, "hilbert_xy2d"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"hilbert_xy2d(x, y, bits) takes 3 arguments, got ${exprs.length}")
        HilbertXY2D(exprs.head, exprs(1),
          literalInt(exprs(2), "hilbert_xy2d", "bits"))
      }),
    (FunctionIdentifier("bpe_tokenize_vocab"),
      new ExpressionInfo(classOf[BpeTokenizeVocab].getName, "bpe_tokenize_vocab"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"bpe_tokenize_vocab(text, vocabId) takes 2 arguments, got ${exprs.length}")
        val id = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
            s.toString
          case other => throw new IllegalArgumentException(
            s"bpe_tokenize_vocab: vocabId must be a string literal, got $other")
        }
        BpeTokenizeVocab(exprs.head, id)
      }))

  /** Idempotent programmatic registration into the session's function
    * registry (for sessions not built with the extensions config). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }

  /** Column-API surface for the native expressions (requires registration). */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)
  def l2Distance(a: Column, b: Column): Column =
    call_function("l2_distance", a, b)
  def minHashSignature(tokens: Column, shingleN: Int, numHashes: Int): Column =
    call_function("minhash_signature", tokens,
      org.apache.spark.sql.functions.lit(shingleN),
      org.apache.spark.sql.functions.lit(numHashes))
  def wordNGrams(tokens: Column, n: Int): Column =
    call_function("word_ngrams", tokens, org.apache.spark.sql.functions.lit(n))
  def topRun(sortedArr: Column): Column = call_function("top_run", sortedArr)
  def luhnMaskCards(text: Column): Column = call_function("luhn_mask_cards", text)
  def luhnCountCards(text: Column): Column = call_function("luhn_count_cards", text)
  def srpBands(vec: Column, tables: Int, bandBits: Int, dim: Int, seed: Int): Column =
    call_function("srp_bands", vec,
      org.apache.spark.sql.functions.lit(tables),
      org.apache.spark.sql.functions.lit(bandBits),
      org.apache.spark.sql.functions.lit(dim),
      org.apache.spark.sql.functions.lit(seed))
  def simHash32(tokens: Column, shingleN: Int): Column =
    call_function("simhash32", tokens, org.apache.spark.sql.functions.lit(shingleN))
  def simHash64(tokens: Column, shingleN: Int): Column =
    call_function("simhash64", tokens, org.apache.spark.sql.functions.lit(shingleN))
  def bpeTokenize(text: Column): Column = call_function("bpe_tokenize", text)
  def bpeTokenizeVocab(text: Column, vocabId: String): Column =
    call_function("bpe_tokenize_vocab", text,
      org.apache.spark.sql.functions.lit(vocabId))
  def unicodeNormalize(text: Column, form: String): Column =
    call_function("unicode_normalize", text,
      org.apache.spark.sql.functions.lit(form))
  def hilbertXY2D(x: Column, y: Column, bits: Int): Column =
    call_function("hilbert_xy2d", x, y,
      org.apache.spark.sql.functions.lit(bits))
  def bpeApplyMerges(text: Column, vocabId: String): Column =
    call_function("bpe_apply_merges", text,
      org.apache.spark.sql.functions.lit(vocabId))
}
