package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Credit-card detection for the PII scrub — `luhn_mask_cards(text)` /
  * `luhn_count_cards(text)` as native unary expressions.
  *
  * A card number cannot be a regex category: the matcher must VALIDATE
  * each candidate digit run with the Luhn checksum, or the scrub both
  * misses real cards split by separators and mass-redacts order ids,
  * timestamps and tracking numbers (the BigCode pipeline gates its
  * card redaction the same way). Per-match validation is exactly what
  * `regexp_replace` cannot express, which makes this the repo's
  * textbook custom-Expression case (SURVEY §2.10 preference order:
  * built-ins, then a native Expression — never a UDF).
  *
  * Candidate grammar, scanned in one pass over the bytes: a maximal run
  * of digits optionally separated by SINGLE spaces or dashes (two
  * separators in a row, or a separator not followed by a digit, ends the
  * run), split into GROUPS at each separator. Within a run the scanner
  * searches contiguous group subsequences — left-to-right start, longest
  * end first — for a 13-19-digit (ISO/IEC 7812 PAN range) Luhn-valid
  * candidate, masks it to `[CARD]` / counts it, and resumes after the
  * match. This is what rescues a card ADJACENT to another number
  * ("ref 12 4539 1488 0343 6467", or a card followed by " 123"): the
  * maximal run fails length/checksum, but the card's own group span
  * still matches — the false-negative an all-or-nothing maximal-run
  * matcher leaks. The adversarial cases (adjacent prefix number, card
  * followed by a short trailer, two back-to-back cards, 20-digit
  * contiguous tail untouched) are pinned in `LuhnCardsSpec`, and
  * `CleaningSpec`'s property sweep checks the scanner against an
  * independently written group-aligned sub-span model on random PANs.
  * Sub-runs never split INSIDE a contiguous group, so a 20-digit IBAN
  * tail or order id cannot have an internal substring mass-redacted;
  * the residual risk is a ~1-in-10 accidental Luhn pass on a genuine
  * group-aligned sub-span, inherent to any retry scheme and preferable
  * to leaking real PANs. The per-start search is bounded by 19 groups
  * (each group holds ≥1 digit), so the scan stays linear with a small
  * constant — and runs under 13 digits total (dates, short ids, the
  * overwhelming majority of digit runs in real text) take a counting
  * fast path that allocates nothing. Both expressions share the
  * scanner; `doGenCode` is a one-line static call so the expressions
  * stay fused in the scan's whole-stage-codegen span (the
  * UnicodeNormalize discipline).
  */
object LuhnCards {

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isSep(c: Char): Boolean = c == ' ' || c == '-'

  /** Luhn checksum over the digit chars of groups `[s0, e0]` (bounds in
    * `gs`/`ge`), walked right-to-left — no candidate string is built. */
  private def luhnValidSpan(
      str: String, gs: Array[Int], ge: Array[Int], s0: Int, e0: Int): Boolean = {
    var sum = 0
    var dbl = false
    var g = e0
    while (g >= s0) {
      var i = ge(g) - 1
      val lo = gs(g)
      while (i >= lo) {
        var d = str.charAt(i) - '0'
        if (dbl) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        dbl = !dbl
        i -= 1
      }
      g -= 1
    }
    sum % 10 == 0
  }

  /** One scan; `mask = true` rebuilds the string, `false` only counts.
    * Returns (masked-or-null, count). */
  private def scan(str: String, mask: Boolean): (String, Int) = {
    val out = if (mask) new java.lang.StringBuilder(str.length) else null
    var count = 0
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (isDigit(c)) {
        // pass 1 over the maximal digit[-sep-digit...] run: find its end
        // and count digits/groups — NO allocation yet
        val start = i
        var j = i
        var digits = 0
        var groups = 1
        var continue = true
        while (continue && j < n) {
          val cj = str.charAt(j)
          if (isDigit(cj)) { digits += 1; j += 1 }
          else if (isSep(cj) && j + 1 < n && isDigit(str.charAt(j + 1))) {
            groups += 1; j += 1
          } else continue = false
        }
        if (digits < 13) {
          // fast path: too few digits for any PAN — copy through untouched
          if (mask) { out.append(str, start, j); () }
        } else {
          // pass 2: record group bounds into primitive arrays (every
          // non-digit inside [start, j) is a single separator by pass 1)
          val groupStart = new Array[Int](groups)
          val groupEnd = new Array[Int](groups)
          var g = 0
          var gs = start
          var k = start
          while (k < j) {
            if (!isDigit(str.charAt(k))) {
              groupStart(g) = gs; groupEnd(g) = k; g += 1; gs = k + 1
            }
            k += 1
          }
          groupStart(g) = gs; groupEnd(g) = j; g += 1
          // prefix digit counts over groups; then search contiguous group
          // subsequences: start left-to-right, end longest-first, first
          // Luhn-valid 13-19-digit span wins, resume after it
          val pref = new Array[Int](g + 1)
          var t = 0
          while (t < g) { pref(t + 1) = pref(t) + (groupEnd(t) - groupStart(t)); t += 1 }
          var emitted = start
          var s0 = 0
          while (s0 < g) {
            var e0 = s0
            while (e0 + 1 < g && pref(e0 + 2) - pref(s0) <= 19) e0 += 1
            var hit = -1
            while (hit < 0 && e0 >= s0) {
              val len = pref(e0 + 1) - pref(s0)
              if (len >= 13 && len <= 19 &&
                  luhnValidSpan(str, groupStart, groupEnd, s0, e0)) hit = e0
              else e0 -= 1
            }
            if (hit >= 0) {
              count += 1
              if (mask) {
                out.append(str, emitted, groupStart(s0))
                out.append("[CARD]")
                emitted = groupEnd(hit)
              }
              s0 = hit + 1
            } else s0 += 1
          }
          if (mask) { out.append(str, emitted, j); () }
        }
        i = j
      } else {
        if (mask) { out.append(c); () }
        i += 1
      }
    }
    (if (mask) out.toString else null, count)
  }

  /** Static helpers shared by eval and codegen. */
  def mask(s: UTF8String): UTF8String = {
    val str = s.toString
    val (masked, cnt) = scan(str, mask = true)
    if (cnt == 0) s else UTF8String.fromString(masked) // no-card fast path
  }
  def count(s: UTF8String): Int = scan(s.toString, mask = false)._2
}

/** `luhn_mask_cards(text)` — Luhn-valid 13-19-digit runs become `[CARD]`. */
final case class LuhnMaskCards(child: Expression) extends UnaryExpression {
  override def prettyName: String = "luhn_mask_cards"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    LuhnCards.mask(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LuhnCards.mask($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `luhn_count_cards(text)` — how many runs [[LuhnMaskCards]] would mask. */
final case class LuhnCountCards(child: Expression) extends UnaryExpression {
  override def prettyName: String = "luhn_count_cards"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    LuhnCards.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LuhnCards.count($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
