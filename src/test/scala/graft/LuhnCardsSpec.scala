package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions.{luhnCountCards, luhnMaskCards}

/** Adversarial pins for the group-aligned sub-span card scanner
  * ([[graft.plans.LuhnCards]]). The random-PAN property sweep lives in
  * `CleaningSpec` ("luhn expression vs an independent ... model"); this
  * suite pins the deterministic cases the sub-span retry exists for —
  * the false negatives an all-or-nothing maximal-run matcher leaks —
  * plus the precision boundaries the retry must NOT cross.
  */
class LuhnCardsSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): (String, Int) = {
    val r = Seq(text).toDF("t")
      .select(luhnMaskCards(col("t")).as("m"), luhnCountCards(col("t")).as("n"))
      .as[(String, Int)].head()
    r
  }

  test("card adjacent to a reference number still masks (the r13 leak)") {
    // maximal run "12 4539 1488 0343 6467" is 18 digits and Luhn-INVALID
    // (so is its 14-digit prefix span) — an all-or-nothing matcher leaks
    // the embedded valid 16-digit card; the group-subsequence search
    // rescues it, masking ONLY the card's groups
    assert(run("ref 12 4539 1488 0343 6467 ok") == (("ref 12 [CARD] ok", 1)))
  }

  test("trailer group that breaks the checksum: only the card masks") {
    // "4539148803436467124" (19 digits) is Luhn-invalid, so the longest
    // span fails and the search falls back to the 16-digit card alone
    assert(run("pay 4539 1488 0343 6467 124 now") == (("pay [CARD] 124 now", 1)))
  }

  test("longest-first tiebreak: a Luhn-valid 19-digit superspan wins whole") {
    // "4539148803436467123" happens to be Luhn-valid at 19 digits — the
    // scanner prefers the LONGEST valid span from each start, so the
    // trailer is swallowed into one mask (documented tiebreak: masking
    // more of an ambiguous PAN-bearing run is the safe direction)
    assert(run("pay 4539 1488 0343 6467 123 now") == (("pay [CARD] now", 1)))
  }

  test("two adjacent cards both mask, separator between them survives") {
    assert(run("4539 1488 0343 6467 6011 0009 9013 9424") ==
      (("[CARD] [CARD]", 2)))
  }

  test("a 20-digit contiguous run is a single group: never split inside") {
    // sub-spans are group-ALIGNED — an IBAN digit tail or long order id
    // with no separators cannot have an internal substring redacted
    assert(run("acct 89370400440532013000 end") ==
      (("acct 89370400440532013000 end", 0)))
  }

  test("runs under 13 digits take the no-allocation fast path untouched") {
    assert(run("order 1234-5678 on 2026-08-14") ==
      (("order 1234-5678 on 2026-08-14", 0)))
  }

  test("double separator ends the run: halves under 13 digits each leak nothing") {
    // "4539 1488" and "0343 6467" are separate runs (two spaces between)
    assert(run("a 4539 1488  0343 6467 b") == (("a 4539 1488  0343 6467 b", 0)))
  }
}
