package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Statistical property of the MinHash estimator (not just determinism):
  * with enough hashes, the estimated Jaccard of documents with KNOWN
  * shingle overlap converges to the true value. */
class MinHashAccuracySpec extends SparkSpec {
  import spark.implicits._

  // construct docs with exact overlap: tokens are unique words, so the
  // 1-gram shingle set is exactly the token set
  private def doc(words: Range): String = words.map(i => s"w$i").mkString(" ")

  test("64-hash estimate within 0.15 of true Jaccard for controlled overlaps") {
    // pairs with true Jaccard 1/3, 0.6, 0.9
    val corpus = Seq(
      (0L, doc(0 until 100)),  (1L, doc(50 until 200)),   // |∩|=50, |∪|=200-50 → 50/150 = 1/3... (0..99)∪(50..199)=0..199=200 → 50/200=0.25
      (10L, doc(0 until 100)), (11L, doc(20 until 120)),  // ∩=80, ∪=120 → 0.666
      (20L, doc(0 until 100)), (21L, doc(5 until 100))    // ∩=95, ∪=100 → 0.95
    ).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(
      Dedup.shingleSet(corpus, col("doc_id"), col("text"), n = 1), numHashes = 64)
    val bySig = sigs.as[(Long, Seq[String])].collect().toMap
    def est(a: Long, b: Long): Double =
      bySig(a).zip(bySig(b)).count { case (x, y) => x == y } / 64.0
    assert(math.abs(est(0L, 1L) - 0.25) < 0.15, s"got ${est(0L, 1L)} want ~0.25")
    assert(math.abs(est(10L, 11L) - 80.0 / 120.0) < 0.15, s"got ${est(10L, 11L)}")
    assert(math.abs(est(20L, 21L) - 0.95) < 0.15, s"got ${est(20L, 21L)}")
  }

  test("LSH recall: high-similarity pair always becomes a candidate, disjoint never") {
    val corpus = Seq(
      (0L, doc(0 until 100)), (1L, doc(2 until 102)),      // jaccard ~0.92
      (2L, doc(1000 until 1100))                            // disjoint
    ).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(
      Dedup.shingleSet(corpus, col("doc_id"), col("text"), n = 1), numHashes = 8)
    val cand = Dedup.candidatePairs(Dedup.lshBands(sigs, numHashes = 8, bands = 4))
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 1L)), "0.92-similar pair must share a band with 4x2 LSH")
    assert(!cand.contains((0L, 2L)) && !cand.contains((1L, 2L)), "disjoint docs never collide")
  }
}
