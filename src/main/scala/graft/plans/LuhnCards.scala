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
  * run), not adjacent to another digit by construction. A candidate with
  * 13-19 digits (the ISO/IEC 7812 PAN range) whose digits pass Luhn is
  * masked to `[CARD]` / counted; anything else — including a 20-digit
  * IBAN tail or a 10-digit phone — is left untouched. Both expressions
  * share the scanner; `doGenCode` is a one-line static call so the
  * expressions stay fused in the scan's whole-stage-codegen span (the
  * UnicodeNormalize discipline).
  */
object LuhnCards {

  /** Luhn checksum over `digits[from, until)` (ASCII digit bytes). */
  private def luhnValid(s: String): Boolean = {
    var sum = 0
    var dbl = false
    var i = s.length - 1
    while (i >= 0) {
      var d = s.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isSep(c: Char): Boolean = c == ' ' || c == '-'

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
        // consume the maximal digit[-sep-digit...] run
        val start = i
        val digits = new java.lang.StringBuilder(20)
        var j = i
        var continue = true
        while (continue && j < n) {
          val cj = str.charAt(j)
          if (isDigit(cj)) { digits.append(cj); j += 1 }
          else if (isSep(cj) && j + 1 < n && isDigit(str.charAt(j + 1))) j += 1
          else continue = false
        }
        val ds = digits.toString
        if (ds.length >= 13 && ds.length <= 19 && luhnValid(ds)) {
          count += 1
          if (mask) { out.append("[CARD]"); () }
        } else if (mask) { out.append(str, start, j); () }
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
