package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')` — Unicode
  * normalization as a native unary expression, the first cleaning step of
  * every published web-corpus pipeline (CCNet normalizes before hashing;
  * OSCAR/FineWeb normalize before dedup): without it, byte-distinct but
  * canonically-equal strings ("é" composed vs "e"+U+0301 decomposed)
  * defeat exact dedup, MinHash shingles and stopword matches alike. The
  * right place for it at 100 TB is exactly here — inside the row
  * pipeline's first map stage, fused into the scan's codegen span, before
  * any shuffle sees the bytes.
  *
  * Implementation: `java.text.Normalizer` (ICU-equivalent for the four
  * standard forms; the JDK ships the full Unicode tables — public API,
  * zero dependencies). The form is a LITERAL fixed at plan time, so the
  * `Normalizer.Form` lookup happens once at expression construction, not
  * per row. Unlike the md5-loop expressions ([[TextHashExpressions]],
  * deliberate CodegenFallback), this one participates in whole-stage
  * codegen with a one-line static call: there is no loop to amortize, so
  * splitting the codegen span WOULD cost — `doGenCode` keeps the stage
  * fused.
  *
  * The fast path matters: real corpora are overwhelmingly already-NFC, and
  * `Normalizer.isNormalized` is a cheap scan that avoids allocating a copy
  * for them — [[UnicodeNormalize.normalize]] returns the INPUT UTF8String
  * unchanged (no re-encode) whenever the text is already in the target
  * form, so the per-row cost on clean data is one code-point scan.
  *
  * Oracle parity: DuckDB's `nfc_normalize` implements the same standard
  * (q123 pins composed output hashes); the other three forms are
  * spec-pinned against closed-form expectations instead (DuckDB exposes
  * only NFC).
  */
final case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  private val form: Normalizer.Form = formName.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (want NFC|NFD|NFKC|NFKD)")
  }

  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.UnicodeNormalize.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Static helper shared by eval and codegen. Already-normalized input is
    * returned as the SAME UTF8String (no decode/alloc beyond the check). */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
