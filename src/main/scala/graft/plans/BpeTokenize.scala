package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fixture subword vocabulary for [[BpeTokenize]] — the SINGLE source of
  * truth shared with the DuckDB oracle (interpolated into q112's SQL via
  * [[sqlValues]], so the two engines can never drift on vocab content).
  *
  * A production pipeline would load a real learned merges table (GPT-2 /
  * SentencePiece vocab files are plain text); the SEGMENTATION CONTRACT
  * here is the real one — WordPiece-style greedy longest-match-first with
  * single-character fallback — and swapping this fixture for a 50k-entry
  * learned vocab changes only this list (the scan below is O(pieces with
  * matching first char) per position, so even 50k entries stay cheap:
  * first-char grouping caps the candidate set at a few hundred).
  *
  * All pieces are lowercase and ≥ 2 chars: a single-char vocab entry would
  * be indistinguishable from the fallback rule, so it is excluded by
  * construction (enforced below).
  */
object BpeVocab {

  /** Common English subword pieces, longest-match candidates. Order here
    * is irrelevant — matching sorts by length; no two distinct same-length
    * pieces can both prefix the same suffix, so the greedy pick is total. */
  val pieces: Seq[String] = Seq(
    // frequent whole short words
    "the", "and", "of", "to", "in", "is", "it", "for", "with", "that",
    // classic suffix merges
    "ing", "ion", "tion", "ation", "ed", "er", "est", "ly", "ment",
    "ness", "able", "ous", "ive", "al", "ic", "ity",
    // frequent bigram/trigram merges
    "th", "he", "an", "re", "on", "at", "en", "es", "or", "te", "ti",
    "as", "ar", "st", "nd", "se", "le", "ou", "io", "ro", "co", "de",
    "un", "ll", "ss", "ent", "ter", "her", "ate", "ver", "all", "int",
    // frequent prefixes
    "pro", "com", "con", "per", "pre", "dis", "sub", "ex"
  ).distinct

  require(pieces.forall(p => p.length >= 2 && p == p.toLowerCase),
    "BpeVocab pieces must be lowercase and >= 2 chars")

  /** `(VALUES ('the'),('and'),…)` — the oracle-side vocab relation. */
  def sqlValues: String =
    pieces.map(p => s"('$p')").mkString("(VALUES ", ",", ")")

  /** Greedy-scan index: candidates by first char, longest first. */
  private[plans] val byFirstChar: Map[Char, Array[String]] =
    pieces.groupBy(_.head).map { case (c, ps) =>
      c -> ps.sortBy(-_.length).toArray
    }

  /** Segment one (already-lowercased) word: at each position take the
    * LONGEST vocab piece prefixing the remaining suffix, else emit the
    * single next character (the unknown-char fallback — no word ever
    * fails to tokenize). Deterministic: same-length distinct pieces
    * cannot both prefix one suffix. */
  private[graft] def segment(word: String, out: java.util.ArrayList[Any]): Int = {
    var pos = 0
    var n = 0
    while (pos < word.length) {
      val cands = byFirstChar.getOrElse(word.charAt(pos), null)
      var matched: String = null
      if (cands != null) {
        var i = 0
        while (i < cands.length && matched == null) {
          val p = cands(i)
          if (pos + p.length <= word.length &&
              word.regionMatches(pos, p, 0, p.length)) matched = p
          i += 1
        }
      }
      val piece = if (matched != null) matched
        else word.substring(pos, pos + 1)
      out.add(UTF8String.fromString(piece))
      pos += piece.length
      n += 1
    }
    n
  }
}

/** `bpe_tokenize(text)` → `array<string>`: real-subword tokenization of a
  * document — lowercase, split on single spaces (exactly
  * `TextOps.tokens`' `split(lower(text), ' ')`, trailing empties kept),
  * then each word segmented by [[BpeVocab.segment]]'s greedy
  * longest-match; pieces concatenate across words in document order
  * (empty words contribute nothing). This replaces the `ceil(len/4)`
  * token-count heuristic with a budgeting unit that behaves like a real
  * BPE/WordPiece tokenizer: one map-side expression, no shuffle, and the
  * piece count is `size(bpe_tokenize(text))`.
  *
  * CodegenFallback follows the [[TextHashExpressions]] precedent: the
  * per-row string scan dominates cost, so splitting the codegen span is
  * unmeasurable, and interpreted eval keeps the char-level semantics
  * byte-identical to the oracle's recursive segmentation.
  */
final case class BpeTokenize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_tokenize"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    // UTF8String.toLowerCase == Spark's lower(); split must keep trailing
    // empties (limit -1) to mirror split(lower(text), ' ') + DuckDB
    // string_split — an empty word then simply yields zero pieces
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val out = new java.util.ArrayList[Any]()
    val words = text.split(" ", -1)
    var i = 0
    while (i < words.length) {
      BpeVocab.segment(words(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
