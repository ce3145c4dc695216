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

/** Bounded-depth longest-match trie over lowercase `a`–`z` pieces — the
  * production-scale matching structure for [[BpeTokenizeVocab]]: one
  * descent of ≤ `maxLen` child-array hops per text position, INDEPENDENT
  * of vocabulary size (the fixture path's first-char candidate scan is
  * O(pieces sharing the first char) per position, fine at 60 entries,
  * wrong at 32k). Nodes are flat int arrays (26 children each); no
  * per-query allocation, no hashing, no substring copies.
  */
final class BpeTrie private (
    children: Array[Array[Int]], terminal: Array[Boolean], val maxLen: Int,
    val size: Int) {

  /** Length of the longest vocab piece prefixing `word` at `pos`, or 0.
    * Walk is capped at `maxLen` hops; a non-`a-z` char ends it (no such
    * piece can exist). */
  def longestMatch(word: String, pos: Int): Int = {
    var node = 0
    var depth = 0
    var best = 0
    val limit = math.min(word.length - pos, maxLen)
    while (depth < limit) {
      val c = word.charAt(pos + depth) - 'a'
      if (c < 0 || c >= 26) return best
      val next = children(node)(c)
      if (next == 0) return best
      node = next
      depth += 1
      if (terminal(node)) best = depth
    }
    best
  }

  /** [[BpeVocab.segment]]'s contract under this trie: greedy longest
    * match at each position, single-char fallback; returns piece count. */
  def segment(word: String, out: java.util.ArrayList[Any]): Int = {
    var pos = 0
    var n = 0
    while (pos < word.length) {
      val m = longestMatch(word, pos)
      val len = if (m > 0) m else 1
      out.add(UTF8String.fromString(word.substring(pos, pos + len)))
      pos += len
      n += 1
    }
    n
  }
}

object BpeTrie {
  /** Build from lowercase `a`–`z` pieces (≥ 2 chars — the 1-char fallback
    * must stay distinguishable from a vocab hit, as in [[BpeVocab]]). */
  def apply(pieces: Iterable[String]): BpeTrie = {
    val children = scala.collection.mutable.ArrayBuffer(new Array[Int](26))
    val terminal = scala.collection.mutable.ArrayBuffer(false)
    var maxLen = 0
    var count = 0
    pieces.foreach { p =>
      require(p.length >= 2 && p.forall(c => c >= 'a' && c <= 'z'),
        s"vocab piece must be >= 2 lowercase a-z chars: '$p'")
      var node = 0
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i) - 'a'
        if (children(node)(c) == 0) {
          children += new Array[Int](26)
          terminal += false
          children(node)(c) = children.length - 1
        }
        node = children(node)(c)
        i += 1
      }
      if (!terminal(node)) count += 1
      terminal(node) = true
      maxLen = math.max(maxLen, p.length)
    }
    new BpeTrie(children.toArray, terminal.toArray, maxLen, count)
  }
}

/** Deterministic production-SIZE synthetic vocabulary (~34k merges) for
  * [[BpeTokenizeVocab]] — the scale-demonstration vocab the fixture's 60
  * entries cannot provide. Derivable in closed form on BOTH engines (the
  * q119 oracle regenerates it with three cross-join CTEs instead of
  * interpolating a 300 KB VALUES list): every 2-letter and 3-letter
  * string over `a`–`z`, the consonant–vowel CVCV 4-letter grid, the
  * `a`/`e`-initial VCVC grid, plus [[BpeVocab.pieces]] (whose 4/5-char
  * suffix merges exercise trie depths the grids do not). 33,692 distinct
  * pieces, max length 5.
  *
  * A REAL learned vocab is loaded through [[BpeVocabs.registerMerges]]
  * instead — this object also defines the merges-file format (one piece
  * per line, `#` comments and blanks skipped) and the writer used to
  * round-trip it in specs.
  */
object BpeVocabLarge {
  private val letters = ('a' to 'z').map(_.toString)
  private val vowels = Seq("a", "e", "i", "o", "u")
  private val cons = letters.filterNot(vowels.contains)

  lazy val pieces: Seq[String] = {
    val two = for (a <- letters; b <- letters) yield a + b
    val three = for (a <- letters; b <- letters; c <- letters) yield a + b + c
    val cvcv = for (c1 <- cons; v1 <- vowels; c2 <- cons; v2 <- vowels)
      yield c1 + v1 + c2 + v2
    val vcvc = for (v1 <- Seq("a", "e"); c1 <- cons; v2 <- vowels; c2 <- cons)
      yield v1 + c1 + v2 + c2
    val all = (BpeVocab.pieces ++ two ++ three ++ cvcv ++ vcvc).distinct
    require(all.forall(_.length <= MaxPieceLen),
      s"synth32k piece longer than the pinned MaxPieceLen=$MaxPieceLen")
    all
  }

  /** Pinned so the q119 oracle's fixed substr(…,1,5..2) probe ladder and
    * this vocab can never drift apart silently. */
  val MaxPieceLen = 5

  /** Write `pieces` in merges-file format (spec round-trip fixture). */
  def writeMerges(path: java.nio.file.Path, ps: Seq[String]): Unit = {
    java.nio.file.Files.write(path,
      ("# graft merges v1" +: ps).mkString("\n").getBytes("UTF-8"))
    ()
  }

  /** Load a merges file: one piece per line, `#` comments/blanks skipped. */
  def loadMerges(path: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(path).asScala.toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
  }
}

/** JVM-local vocabulary registry for [[BpeTokenizeVocab]]. The expression
  * serializes only the vocab ID (a few bytes in the broadcast task
  * binary); each JVM resolves the id to a [[BpeTrie]] lazily, once. The
  * two built-ins resolve from code (deterministic on every JVM); a
  * file-backed vocab registered via [[registerMerges]] resolves by
  * reading the path on whichever JVM evaluates first — on a cluster the
  * file must be executor-visible (`spark-submit --files`, the standard
  * vocab-shipping mechanism, or a shared FS). */
object BpeVocabs {
  private val suppliers =
    new java.util.concurrent.ConcurrentHashMap[String, () => Seq[String]]()
  private val tries =
    new java.util.concurrent.ConcurrentHashMap[String, BpeTrie]()
  suppliers.put("fixture", () => BpeVocab.pieces)
  suppliers.put("synth32k", () => BpeVocabLarge.pieces)

  /** Register a merges-file vocabulary under `id` (lazy: the file is read
    * at first tokenize on each JVM, so the path must be visible there). */
  def registerMerges(id: String, path: java.nio.file.Path): Unit = {
    suppliers.put(id, () => BpeVocabLarge.loadMerges(path))
    tries.remove(id) // re-registration must not serve a stale trie
    ()
  }

  def trie(id: String): BpeTrie = {
    val t = tries.get(id)
    if (t != null) t
    else tries.computeIfAbsent(id, _ => {
      val s = suppliers.get(id)
      require(s != null,
        s"unknown BPE vocab '$id' (registered: ${ids.mkString(", ")})")
      BpeTrie(s())
    })
  }

  def ids: Seq[String] = {
    import scala.jdk.CollectionConverters._
    suppliers.keySet.asScala.toSeq.sorted
  }
}

/** `bpe_tokenize_vocab(text, 'vocabId')` — [[BpeTokenize]]'s segmentation
  * contract (lowercase, split on single spaces, greedy longest-match per
  * word, single-char fallback) against a REGISTERED vocabulary
  * ([[BpeVocabs]]), matched through the bounded-depth [[BpeTrie]] so a
  * production-size vocab costs O(maxPieceLen) per position, not
  * O(candidates). The expression ships only the id string; tries build
  * once per JVM. CodegenFallback for the same reason as [[BpeTokenize]].
  */
final case class BpeTokenizeVocab(child: Expression, vocabId: String)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_tokenize_vocab"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${other.catalogString}")
  }

  @transient private lazy val trie = BpeVocabs.trie(vocabId)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val out = new java.util.ArrayList[Any]()
    val words = text.split(" ", -1)
    var i = 0
    while (i < words.length) {
      trie.segment(words(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
