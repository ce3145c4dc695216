package graft

import java.security.MessageDigest
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Row}

/** The SURVEY §5.3 canonicalization protocol, in-JVM (the survey built it
  * in Python; this is the faithful Scala port the §7 plan calls for):
  * rows in query order, fields joined with `|`, lines with `\n`, md5 over
  * UTF-8; floats as Python `%.6g` with `-0.0` normalized; timestamps as
  * Python `str(datetime)` (µs UTC, fraction omitted when zero); NULL.
  *
  * Calibrated against the §8 hash table: Q13 (ints/floats), Q18
  * (zero-micro timestamps) and Q22 (real-µs timestamps) all reproduce the
  * recorded md5s exactly.
  */
object Canon {

  /** Python `'%.6g' % v` replica. Java's own %g is NOT equivalent in two
    * ways: it keeps trailing zeros, and it rounds HALF_UP from the
    * double's shortest decimal representation — C/Python round the EXACT
    * binary value HALF_EVEN (observed: 104912.5 → "104912" in Python,
    * "104913" via Java %g). So build from `new BigDecimal(v)` (exact) with
    * a 6-digit HALF_EVEN MathContext, then apply C's %g display rules
    * (scientific iff exp < -4 or ≥ 6; strip trailing zeros). */
  def g6(v0: Double): String = {
    val v = if (v0 == 0.0) 0.0 else v0 // -0.0 → 0.0 (§5.3 hazard)
    if (v == 0.0) return "0"
    if (v.isNaN) return "nan"
    if (v.isInfinite) return if (v > 0) "inf" else "-inf"
    val bd = new java.math.BigDecimal(v)
      .round(new java.math.MathContext(6, java.math.RoundingMode.HALF_EVEN))
    val exp = bd.precision - bd.scale - 1
    if (exp < -4 || exp >= 6) {
      val mant = bd.movePointLeft(exp).stripTrailingZeros.toPlainString
      val sign = if (exp < 0) "-" else "+"
      val ae = math.abs(exp)
      val es = if (ae < 10) "0" + ae else ae.toString
      s"${mant}e$sign$es"
    } else {
      bd.stripTrailingZeros.toPlainString
    }
  }

  private val tsNoFrac = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val tsFrac = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  def value(v: Any): String = v match {
    case null => "NULL"
    case d: java.lang.Double => g6(d)
    case f: java.lang.Float => g6(f.toDouble)
    case t: java.sql.Timestamp =>
      val ldt = t.toInstant.atZone(ZoneOffset.UTC).toLocalDateTime
      if (ldt.getNano == 0) ldt.format(tsNoFrac) else ldt.format(tsFrac)
    case d: java.sql.Date => d.toString
    case other => String.valueOf(other)
  }

  def row(r: Row): String =
    (0 until r.length).map(i => value(r.get(i))).mkString("|")

  /** Canonical md5 of a (deterministically ordered) result. */
  def md5(df: DataFrame): String = {
    val body = df.collect().map(row).mkString("\n")
    MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
