package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the §8-snapshot adapter surface (VERDICT r19 #6): the adapter
  * list is the one place gate-encoding drift could hide — a fifth entry
  * silently re-encoding a gate must be renegotiated in the open, by
  * changing THIS pinned set in the same commit as the adapter and
  * recording the exactness derivation in SurveyCheck's scaladoc.
  */
class SurveyCheckSpec extends AnyFunSuite {

  test("snapshot adapter list is frozen at exactly the four adjudicated entries") {
    assert(SurveyCheck.adapters.keySet == Set(
      "q18_date_trunc_day",   // DATE vs TIMESTAMP canonicalization
      "q25_cosine_topk",      // §8's float32 fold replica
      "q10_eqhist_cumedist",  // micro-unit BIGINT → shade6/1e6 (exact)
      "q22_sessionize"),      // snapshot hashed the sorted body
      "adding/removing a §8 adapter must update this pin AND record the " +
        "exact derivation in SurveyCheck.adapters' scaladoc")
  }

  test("every adapter targets a declared round-1 query with a recorded §8 hash") {
    SurveyCheck.adapters.keySet.foreach { n =>
      assert(Queries.all.contains(n), s"adapter $n targets no declared query")
      SurveyCheck.expected.foreach { case (sf, hashes) =>
        assert(hashes.contains(n), s"adapter $n has no §8 hash at $sf")
      }
    }
  }
}
