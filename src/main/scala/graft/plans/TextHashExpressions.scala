package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document text-hash signatures as native Catalyst
  * expressions — the scale path for the near-dup operators.
  *
  * The SQL-composed pipelines in [[graft.operators.Dedup]] build
  * signatures by EXPLODING the shingle set (one row per shingle, ×32 rows
  * per shingle for SimHash bit weights) and re-aggregating per document —
  * at 100 TB that shuffles the entire shingle volume, which round-1 soak
  * measurements showed is the dominant near-dup cost (linear in corpus
  * text size, >10× the document row count). These expressions compute the
  * identical signatures inside the row pipeline: no explode, no shuffle,
  * no aggregation — signature derivation becomes a map stage, and the
  * only remaining shuffle in LSH dedup is the (bounded) band join.
  *
  * Hash parity is bit-exact with the composed form and the DuckDB oracle:
  * the same `md5(seed || "|" || shingle)` hex strings, the same
  * lexicographic minima, the same `conv(substr(md5(w),1,8),16,10)` 32-bit
  * value and ±1 bit-weight vote (asserted equal in NativeHashParitySpec;
  * q31/q32 oracle hashes unchanged).
  *
  * CodegenFallback is deliberate: the md5 loop dominates per-row cost, so
  * splitting the whole-stage-codegen span costs nothing measurable, and
  * an interpreted eval keeps the md5 byte-handling identical to Spark's
  * own `Md5` expression (both call java.security.MessageDigest).
  */
object TextHashExpressions {

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** MessageDigest is stateful and NOT thread-safe; the expression
    * instance is shared across concurrently-running tasks, so the digest
    * is per-thread. */
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Builds the shingle strings of `toks` (empties included — identical to
    * `TextOps.shingles` over `TextOps.tokens`) and feeds each to `f`. Null
    * elements are skipped with concat_ws semantics (no separator emitted),
    * exactly as [[WordNGrams]] does — the composed `explode(word_ngrams)`
    * pipeline tolerates containsNull arrays, so the registered signature
    * functions must produce the same shingles or the two surfaces diverge
    * (parity pinned in NativeHashParitySpec). Returns false when the doc
    * has fewer than `n` tokens. */
  private def eachShingle(input: Any, n: Int)(f: String => Unit): Boolean = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    if (len < n) return false
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var k = 0
      var wrote = false
      while (k < n) {
        if (!toks.isNullAt(i + k)) {
          if (wrote) sb.append(' ')
          sb.append(toks.getUTF8String(i + k).toString)
          wrote = true
        }
        k += 1
      }
      f(sb.toString)
      i += 1
    }
    true
  }

  private def checkTokensType(child: Expression, name: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<string> tokens, got ${other.catalogString}")
    }

  /** `minhash_signature(tokens, shingleN, numHashes)` → array<string>:
    * per seed s, the lexicographic minimum of `md5('s|' || shingle)` over
    * the doc's token n-gram shingles (duplicates are harmless under MIN,
    * so no distinct pass is needed). NULL when the doc has < n tokens —
    * matching the composed pipeline, where such docs produce no shingle
    * rows and drop out of the signature aggregation. */
  final case class MinHashSignature(child: Expression, shingleN: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

    override def prettyName: String = "minhash_signature"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    // NULL on non-null input (short docs): without this override codegen
    // would treat isNull as literal false and lose the null path
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkTokensType(child, prettyName)

    // per-seed prefix bytes ("0|", "1|", …) precomputed once per instance
    @transient private lazy val prefixBytes: Array[Array[Byte]] =
      Array.tabulate(numHashes)(s => s"$s|".getBytes(StandardCharsets.UTF_8))

    override def nullSafeEval(input: Any): Any = {
      val md = md5.get()
      val mins = new Array[String](numHashes)
      val any = eachShingle(input, shingleN) { shingle =>
        // encode the shingle once; each seed digests prefix-bytes + these
        val sBytes = shingle.getBytes(StandardCharsets.UTF_8)
        var s = 0
        while (s < numHashes) {
          md.reset()
          md.update(prefixBytes(s))
          md.update(sBytes)
          val h = hex(md.digest())
          if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
          s += 1
        }
      }
      if (!any) null
      else new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `word_ngrams(tokens, n)` → array<string>: the token n-gram shingle
    * array, element-for-element identical to the higher-order-function
    * form (`TextOps.shingles`): empty array when the doc has fewer than
    * `n` tokens, duplicates preserved, single-space joined.
    *
    * Exists for throughput, not semantics: Spark's higher-order functions
    * (`transform`, `aggregate`, …) have no codegen — each element
    * evaluates a lambda through interpreted expression nodes, which
    * measured ~10× slower than this single-pass loop on the bigram-count
    * query (q66). The HOF form stays as the independent cross-check
    * (NativeHashParitySpec). */
  /** `top_run(sortedArr)` → `struct(best int, bg string)`: run-length
    * argmax over an array whose equal values are ALREADY ADJACENT (the
    * caller sorts — `array_sort(word_ngrams(...))` in the Gopher gates).
    * Exactly the interpreted `aggregate` fold it replaces
    * ([[graft.operators.Cleaning]]): `best` = longest run, `bg` = its
    * value, ties resolved to the FIRST (= lexicographically smallest
    * after a sort) because only a strictly longer run replaces the best;
    * empty array → (0, ""). The fold evaluated a 4-field struct of
    * Catalyst conditionals per element, interpreted — the round-10 plan
    * audit flagged that per-token CPU as the battery's 100 TB cost, and
    * this one JVM loop is the measured ~n× escape hatch (same trade as
    * [[WordNGrams]] vs the HOF `transform`). Null elements cannot occur
    * in the gate pipelines (word_ngrams emits containsNull = false) and
    * are treated as run-breaking, never matching, never becoming `bg`. */
  final case class TopRun(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def prettyName: String = "top_run"
    override def dataType: DataType = StructType(Seq(
      StructField("best", IntegerType, nullable = false),
      StructField("bg", StringType, nullable = false)))
    override def checkInputDataTypes(): TypeCheckResult =
      checkTokensType(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      var prev: UTF8String = null // distinct from any element → first run = 1
      var run = 0
      var best = 0
      var bg = UTF8String.EMPTY_UTF8
      var i = 0
      while (i < len) {
        if (arr.isNullAt(i)) { prev = null; run = 0 }
        else {
          val g = arr.getUTF8String(i)
          run = if (prev != null && g.equals(prev)) run + 1 else 1
          if (run > best) { best = run; bg = g }
          prev = g
        }
        i += 1
      }
      InternalRow(best, bg)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  final case class WordNGrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"n must be >= 1, got $n")

    override def prettyName: String = "word_ngrams"
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkTokensType(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val len = toks.numElements()
      if (len < n) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](len - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= len - n) {
        sb.setLength(0)
        var k = 0
        var wrote = false
        while (k < n) {
          // concat_ws semantics: null elements are skipped entirely (no
          // separator emitted) — the HOF form tolerates containsNull
          // arrays, so this loop must too (parity pinned in
          // NativeHashParitySpec)
          if (!toks.isNullAt(i + k)) {
            if (wrote) sb.append(' ')
            sb.append(toks.getUTF8String(i + k).toString)
            wrote = true
          }
          k += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `srp_bands(vec, tables, bandBits, dim, seed)` → array<int>: the
    * signed-random-projection LSH band keys of an `array<double>`
    * embedding — per table t, `bandBits` sign bits of Gaussian
    * hyperplane projections, packed big-endian into one int key.
    *
    * The hyperplane matrix is derived per expression INSTANCE from
    * `seed` via `scala.util.Random` (Java LCG — stable across JVMs), in
    * exactly the order the composed form draws it
    * (`Array.fill(tables, bandBits)(Array.fill(dim)(nextGaussian))`), so
    * the keys are bit-identical to the HOF fold (pinned in
    * SimilaritySpec). Exists for the same reason as [[WordNGrams]]: the
    * HOF `aggregate(zip_with(...))` dot products evaluate an interpreted
    * lambda per element — tables×bandBits×dim lambda evaluations per row
    * versus one flat loop here. Dot products truncate to the shorter of
    * (vector length, dim), matching `zip_with`. */
  final case class SrpBands(
      child: Expression, tables: Int, bandBits: Int, dim: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    require(tables >= 1 && bandBits >= 1 && bandBits <= 31 && dim >= 1,
      s"invalid srp_bands($tables, $bandBits, $dim)")

    override def prettyName: String = "srp_bands"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<double>, got ${other.catalogString}")
      }

    // [tables*bandBits][dim], drawn t-major then bit — the composed order
    @transient private lazy val planes: Array[Array[Double]] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(tables * bandBits)(Array.fill(dim)(rnd.nextGaussian()))
    }

    override def nullSafeEval(input: Any): Any = {
      val vec = input.asInstanceOf[ArrayData]
      val n = math.min(vec.numElements(), dim)
      val v = new Array[Double](n)
      var d = 0
      while (d < n) { v(d) = vec.getDouble(d); d += 1 }
      val keys = new Array[Any](tables)
      var t = 0
      while (t < tables) {
        var key = 0
        var b = 0
        while (b < bandBits) {
          val plane = planes(t * bandBits + b)
          var dot = 0.0
          var i = 0
          while (i < n) { dot += v(i) * plane(i); i += 1 }
          key = key * 2 + (if (dot > 0) 1 else 0)
          b += 1
        }
        keys(t) = key
        t += 1
      }
      new GenericArrayData(keys)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `simhash32(tokens, shingleN)` → bigint: the 32-bit SimHash over the
    * doc's DISTINCT shingles (bit weights vote +1/−1 per shingle, so
    * duplicates must be collapsed — the composed pipeline's `.distinct()`).
    * Bit b of the per-shingle hash is bit b of the first-8-hex-chars value
    * of md5(shingle), exactly `conv(substring(md5(w),1,8),16,10)`. NULL
    * when the doc has < n tokens. */
  final case class SimHash32(child: Expression, shingleN: Int)
      extends UnaryExpression with CodegenFallback {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")

    override def prettyName: String = "simhash32"
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkTokensType(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val md = md5.get()
      val seen = new java.util.HashSet[String]
      val wgt = new Array[Int](32)
      val any = eachShingle(input, shingleN) { shingle =>
        if (seen.add(shingle)) {
          md.reset()
          val h = hex(md.digest(shingle.getBytes(StandardCharsets.UTF_8)))
          val h32 = java.lang.Long.parseLong(h.substring(0, 8), 16)
          var b = 0
          while (b < 32) {
            wgt(b) += (if (((h32 >> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      if (!any) null
      else {
        var sh = 0L
        var b = 0
        while (b < 32) { if (wgt(b) > 0) sh |= 1L << b; b += 1 }
        sh
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `simhash64(tokens, shingleN)` → bigint: 64-bit SimHash over the
    * doc's distinct shingles — the corpus-scale variant of [[SimHash32]].
    * Same construction with the full first-16-hex-chars md5 value, so the
    * Hamming-≤3 pigeonhole band join gets 4 chunks of 16 bits: 4×65536
    * buckets instead of 32-bit's 4×256, shrinking candidate-pair growth
    * by ~256× at equal corpus size (q32's oracle stays 32-bit; this is
    * the documented scale path, equivalence-tested against the N² scan). */
  final case class SimHash64(child: Expression, shingleN: Int)
      extends UnaryExpression with CodegenFallback {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")

    override def prettyName: String = "simhash64"
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkTokensType(child, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val md = md5.get()
      val seen = new java.util.HashSet[String]
      val wgt = new Array[Int](64)
      val any = eachShingle(input, shingleN) { shingle =>
        if (seen.add(shingle)) {
          md.reset()
          val h = hex(md.digest(shingle.getBytes(StandardCharsets.UTF_8)))
          val h64 = java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16)
          var b = 0
          while (b < 64) {
            wgt(b) += (if (((h64 >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      if (!any) null
      else {
        var sh = 0L
        var b = 0
        while (b < 64) { if (wgt(b) > 0) sh |= 1L << b; b += 1 }
        sh
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
