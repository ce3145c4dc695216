package graft

import org.apache.spark.sql.functions._

import graft.operators.ApproxOps

/** [[graft.functions.HeavyHittersAggregator]] / [[ApproxOps.heavyHitters]]
  * — the Misra–Gries guarantee, exactness above the vocabulary size, and
  * partitioning-invariance of the exact regime (the property q124's gate
  * rests on). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 1000 tokens: "hot" 400×, "warm" 250×, then 35 cold tokens 10× each
  private def corpus = {
    val toks = Seq.fill(400)("hot") ++ Seq.fill(250)("warm") ++
      (0 until 35).flatMap(i => Seq.fill(10)(s"cold$i"))
    toks.toDF("w")
  }

  test("exact regime: cap above distinct count reproduces exact counts") {
    val got = ApproxOps.heavyHitters(corpus, col("w"), cap = 64)
      .as[(String, Long)].collect().toMap
    assert(got("hot") == 400L && got("warm") == 250L)
    assert(got.size == 37 && (0 until 35).forall(i => got(s"cold$i") == 10L))
  }

  test("exact regime is partitioning-invariant (merge is associative)") {
    val a = ApproxOps.heavyHitters(corpus.repartition(1), col("w"), cap = 64)
      .as[(String, Long)].collect().toMap
    val b = ApproxOps.heavyHitters(corpus.repartition(13), col("w"), cap = 64)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("MG guarantee at a binding cap: frequent survive, estimates err low by <= N/(cap+1)") {
    // N = 1000, cap = 9 -> error bound 100; hot(400) and warm(250) are
    // guaranteed present with est in [true-100, true]
    val got = ApproxOps.heavyHitters(corpus.repartition(7), col("w"), cap = 9)
      .as[(String, Long)].collect().toMap
    assert(got.size <= 9)
    for ((t, freq) <- Seq("hot" -> 400L, "warm" -> 250L)) {
      assert(got.contains(t), s"$t must survive (freq $freq > N/(cap+1) = 100)")
      assert(got(t) <= freq && got(t) >= freq - 100L,
        s"$t estimate ${got(t)} outside [${freq - 100}, $freq]")
    }
  }

  test("grouped: per-group state independently capped; nulls dropped") {
    val df = Seq(
      ("s1", "x"), ("s1", "x"), ("s1", "y"),
      ("s2", "z"), ("s2", null)
    ).toDF("src", "w")
    val got = ApproxOps.heavyHitters(df, col("w"), cap = 8, col("src"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("s1", "x", 2L), ("s1", "y", 1L), ("s2", "z", 1L)))
  }
}
