package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("weightedPageRank: uniform cycle stays uniform and conserves rank mass") {
    // A→B→C→A: no dangling nodes, symmetric — every iteration must keep
    // the exact uniform fixpoint 1/3 (also pins that transition
    // probabilities normalize to 1 per source)
    val cycle = Seq(("A", "B", 1L), ("B", "C", 1L), ("C", "A", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.weightedPageRank(cycle, iters = 5)
      .as[(String, Double)].collect().toMap
    assert(r.size == 3 && r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12), s"$r")
    r // fixpoint exactly, mass conserved
  }

  test("weightedPageRank: in-degree-0 node sits at the teleport share; weights split inflow") {
    // A links B twice and C once (weights 2, 1); nobody links A.
    // n=3: rank(A) = 0.15/3 = 0.05 after any number of iterations;
    // after one iteration rank(B) = 0.05 + 0.85·(2/3)·(1/3),
    // rank(C) = 0.05 + 0.85·(1/3)·(1/3).
    val edges = Seq(("A", "B", 2L), ("A", "C", 1L)).toDF("src", "dst", "w")
    val r1 = Graph.weightedPageRank(edges, iters = 1)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r1("A") - 0.05) < 1e-12, s"$r1")
    assert(math.abs(r1("B") - (0.05 + 0.85 * (2.0 / 3) / 3)) < 1e-12, s"$r1")
    assert(math.abs(r1("C") - (0.05 + 0.85 * (1.0 / 3) / 3)) < 1e-12, s"$r1")
    // B and C are dangling: their mass leaks (the documented simplified
    // formulation), so total rank strictly decreases below 1
    assert(r1.values.sum < 1.0)
    // iters = 0 returns the uniform initialization
    val r0 = Graph.weightedPageRank(edges, iters = 0)
      .as[(String, Double)].collect().toMap
    assert(r0.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12), s"$r0")
  }

  test("checkpointEvery truncates lineage without changing any value (long chains)") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L), ("a", "c", 1L))
      .toDF("src", "dst", "w")
    // 6 iterations keeps the UNtruncated comparison plan small enough for
    // test-suite latency (plan analysis cost grows fast with join depth —
    // which is exactly why checkpointEvery exists for real long chains)
    val plainPr = Graph.weightedPageRank(edges, iters = 6)
      .as[(String, Double)].collect().toMap
    val ckptPr = Graph.weightedPageRank(edges, iters = 6, checkpointEvery = 2)
      .as[(String, Double)].collect().toMap
    assert(plainPr == ckptPr, s"$plainPr vs $ckptPr")
    val plainH = Graph.hits(edges, iters = 4)
      .as[(String, Double, Double)].collect().toSet
    val ckptH = Graph.hits(edges, iters = 4, checkpointEvery = 2)
      .as[(String, Double, Double)].collect().toSet
    assert(plainH == ckptH, s"$plainH vs $ckptH")
  }

  test("hits: star graph concentrates authority in the center, hubs in the leaves") {
    // three leaves all point at one center
    val edges = Seq(("l1", "c", 1L), ("l2", "c", 1L), ("l3", "c", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.hits(edges, iters = 2)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // authority: all of it at the center, exactly (L1 norm = 1)
    assert(math.abs(got("c")._2 - 1.0) < 1e-12, s"$got")
    assert(Seq("l1", "l2", "l3").forall(l => got(l)._2 == 0.0))
    // hubs: the three leaves split hub mass evenly; the center (no
    // out-edges) holds exactly 0
    assert(got("c")._1 == 0.0)
    assert(Seq("l1", "l2", "l3").forall(l => math.abs(got(l)._1 - 1.0 / 3) < 1e-12))
    // both scores stay L1-normalized after every iteration
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-12)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
    // weights matter: doubling one leaf's edge weight shifts hub mass to it
    val weighted = Seq(("l1", "c", 2L), ("l2", "c", 1L)).toDF("src", "dst", "w")
    val wg = Graph.hits(weighted, iters = 2)
      .as[(String, Double, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(wg("l1") > wg("l2"), s"$wg")
  }
}
