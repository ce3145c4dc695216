package graft

import org.scalatest.funsuite.AnyFunSuite

/** Canon.g6 must replicate Python's `'%.6g'` exactly (expected strings
  * below are literal Python outputs). */
class CanonSpec extends AnyFunSuite {

  test("g6 matches Python %.6g on representative values") {
    val cases = Seq(
      5.0 -> "5", 0.05 -> "0.05", 123456.7 -> "123457",
      1000000.0 -> "1e+06", 999999.4 -> "999999", 0.0001234567 -> "0.000123457",
      0.0000123 -> "1.23e-05", 1e20 -> "1e+20", -42.5 -> "-42.5",
      -0.0 -> "0", 0.0 -> "0", 0.3714845 -> "0.371484", 28.35 -> "28.35",
      104912.5 -> "104912",  // exact binary tie → HALF_EVEN (Java %g says 104913)
      410106.5 -> "410106",
      1.005 -> "1.005", 18157.85 -> "18157.8")
    cases.foreach { case (v, want) =>
      assert(Canon.g6(v) == want, s"g6($v)")
    }
  }

  test("timestamp formatting: fraction only when micros nonzero") {
    val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val t2 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:09:58.778549Z"))
    assert(Canon.value(t1) == "2024-01-01 00:00:00")
    assert(Canon.value(t2) == "2024-01-01 00:09:58.778549")
    assert(Canon.value(null) == "NULL")
  }
}
