package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** [[graft.plans.UnicodeNormalize]] — the native `unicode_normalize`
  * expression. Expectations are closed-form from the Unicode standard,
  * spelled as explicit escapes so composed vs decomposed is visible in
  * the source: U+0301 combining acute, U+00E9 composed é, U+FB01 the ﬁ
  * ligature (canonical-invariant, compatibility-decomposable). */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "café"  // e + combining acute, 5 code points
  private val Composed = "café"     // precomposed é, 4 code points

  private def norm(s: String, form: String): String =
    Seq(s).toDF("t").select(TextOps.unicodeNormalize(col("t"), form)).as[String].head()

  test("NFC composes e + U+0301 into é; NFD decomposes it back") {
    assert(norm(Decomposed, "NFC") == Composed)
    assert(norm(Composed, "NFD") == Decomposed)
  }

  test("NFC preserves the U+FB01 ligature; NFKC/NFKD expand it") {
    assert(norm("ﬁn", "NFC") == "ﬁn")
    assert(norm("ﬁn", "NFKC") == "fin")
    assert(norm("ﬁné", "NFKD") == "finé")
    assert(norm("ﬁné", "NFKC") == "finé")
  }

  test("already-normalized ASCII passes through; null stays null; empty stays empty") {
    assert(norm("plain ascii 42", "NFC") == "plain ascii 42")
    assert(norm("", "NFC") == "")
    val n = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(TextOps.unicodeNormalize(col("t"), "NFC")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("SQL registry surface agrees with the Column API") {
    val viaSql = spark.sql(
      s"SELECT unicode_normalize('café', 'NFC') AS s").as[String].head()
    assert(viaSql == Composed)
  }

  test("unknown form and non-literal form are loud plan-time errors") {
    val e1 = intercept[Exception] { norm("x", "NFX") }
    assert(e1.getMessage.contains("unknown form") || e1.getMessage.contains("NFX"))
    val e2 = intercept[Exception] {
      Seq(("x", "NFC")).toDF("t", "f")
        .selectExpr("unicode_normalize(t, f)").collect()
    }
    assert(e2.getMessage.contains("literal"))
  }

  test("doGenCode compiles for real (no silent whole-stage fallback)") {
    // spark.sql.codegen.fallback (default true) would mask a broken
    // doGenCode template behind interpreted execution in the DataFrame
    // tests above; generating an UnsafeProjection compiles the Java
    // directly and throws on any codegen error
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.plans.UnicodeNormalize(
      BoundReference(0, org.apache.spark.sql.types.StringType, nullable = true), "NFC")
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    assert(proj(InternalRow(UTF8String.fromString(Decomposed)))
      .getUTF8String(0).toString == Composed)
    assert(proj(InternalRow(null)).isNullAt(0))
  }

  test("normalization makes byte-distinct canonical equivalents dedup-equal") {
    // the reason the operator exists: composed vs decomposed defeats
    // exact dedup unless normalized first
    val docs = Seq((1L, Decomposed + " menu"), (2L, Composed + " menu")).toDF("id", "t")
    val distinctRaw = docs.select(col("t")).distinct().count()
    val distinctNorm = docs.select(TextOps.unicodeNormalize(col("t"), "NFC")).distinct().count()
    assert(distinctRaw == 2L && distinctNorm == 1L)
  }
}
