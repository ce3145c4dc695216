package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the bench harness's own safety logic (no SparkSession
  * needed — the timing plumbing is driven by the driver's real Bench run).
  */
class BenchSpec extends AnyFunSuite {

  test("slow-query ceiling names any reading over budget in the emitted JSON fragment") {
    // the r15 failure profile: a brand-new query with no drift baseline
    // that runs for minutes — must be named even though it completes
    val timings = Seq(
      "q01_amp_phase" -> 0.4,
      "q158_hilbert_key" -> 619.6,
      "shared_pair_table" -> 1.3,
      "q999_synthetic_slow" -> 31.0)
    assert(Bench.slowJson(timings) == """["q158_hilbert_key","q999_synthetic_slow"]""")
  }

  test("slow-query ceiling stays quiet when every reading is under budget") {
    val timings = Seq("q01_amp_phase" -> 0.4, "q147_trained_langid" -> 7.6,
      "q999_at_ceiling" -> Bench.slowCeilingSec) // AT the budget is not over it
    assert(Bench.slowJson(timings) == "[]")
  }

  test("ceiling is an explicit constant with sf0.1 headroom (every healthy query <= ~8s)") {
    assert(Bench.slowCeilingSec == 30.0)
  }
}
