package graft

import org.apache.spark.sql.functions._

import graft.operators.ApproxOps

/** Count-min sketch pins: the one-sided error structure, the
  * deterministic-state property (unlike Misra–Gries), and the
  * day-over-day elementwise merge law. The gated query (q139) covers the
  * exact-when-wide regime; these cover the binding regime it cannot. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 3
  private val narrow = 8 // << vocab: collisions guaranteed (pigeonhole)

  // 60 distinct tokens, token i occurring i+1 times — an open-vocab
  // stand-in with known exact counts
  private def corpus = (0 until 60).flatMap(i => Seq.fill(i + 1)(s"tok$i"))

  test("estimates are one-sided: est >= true always, and collisions only inflate") {
    val df = corpus.toDF("w")
    val sk = ApproxOps.countMinSketch(df, col("w"), depth, narrow)
    val probes = (0 until 60).map(i => s"tok$i")
    val est = ApproxOps.cmsPointEstimates(sk, probes, depth, narrow)
      .select("token", "est").as[(String, Long)].collect().toMap
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    probes.foreach { p =>
      assert(est(p) >= exact(p), s"$p: est ${est(p)} below true ${exact(p)}")
    }
    // at width 8 against 60 tokens, SOME probe must be inflated — the
    // binding regime is actually exercised, not vacuously passed
    assert(probes.exists(p => est(p) > exact(p)),
      "narrow sketch showed no collision — fixture degenerate")
    // and the classic bound: est <= true + N (total mass) trivially,
    // but per-row a cell can hold at most the mass hashed into it; the
    // min over rows keeps every estimate at or below the heaviest
    // single cell
    val n = corpus.size.toLong
    probes.foreach(p => assert(est(p) <= exact(p) + n))
  }

  test("sketch state is bit-deterministic under any partitioning (unlike MG survivors)") {
    val a = ApproxOps.countMinSketch(corpus.toDF("w").repartition(1),
      col("w"), depth, narrow).select("sketch").as[Array[Long]].head()
    val b = ApproxOps.countMinSketch(corpus.toDF("w").repartition(7),
      col("w"), depth, narrow).select("sketch").as[Array[Long]].head()
    assert(a.toSeq == b.toSeq, "counter matrix must not depend on partitioning")
  }

  test("day-over-day merge law: cms(day1) + cms(day2) == cms(union), estimates exact when wide") {
    val day1 = corpus.take(500)
    val day2 = corpus.drop(500)
    val wide = 256 // >> vocab: estimates exact
    def sk(rows: Seq[String]) = ApproxOps.countMinSketch(
      rows.toDF("w"), col("w"), depth, wide)
      .select(col("sketch")).as[Array[Long]].head()
    val merged = sk(day1).zip(sk(day2)).map { case (x, y) => x + y }
    assert(merged.toSeq == sk(corpus).toSeq,
      "elementwise merge must equal the whole-corpus sketch")
    // cmsMerge column form agrees with the Scala-side zip
    val m = sk(day1).toSeq.toDF().agg(collect_list("value")).as[Seq[Long]].head()
    assert(m == sk(day1).toSeq) // sanity on the encoder round-trip
    val viaCol = Seq((sk(day1), sk(day2))).toDF("a", "b")
      .select(ApproxOps.cmsMerge(col("a"), col("b")).as("m"))
      .as[Array[Long]].head()
    assert(viaCol.toSeq == merged.toSeq)
    // wide sketch is exact on a probe with a known count
    val est = ApproxOps.cmsPointEstimates(
      ApproxOps.countMinSketch(corpus.toDF("w"), col("w"), depth, wide),
      Seq("tok59", "never-seen"), depth, wide)
      .select("token", "est").as[(String, Long)].collect().toMap
    assert(est("tok59") == 60L && est("never-seen") == 0L)
  }

  test("depth 1 sketch estimates via the single-cell fast path") {
    val sk = ApproxOps.countMinSketch(Seq("a", "a", "b").toDF("w"),
      col("w"), depth = 1, width = 64)
    val est = ApproxOps.cmsPointEstimates(sk, Seq("a", "b", "c"), 1, 64)
      .select("token", "est").as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 2L, "b" -> 1L, "c" -> 0L))
  }

  test("constructor and probe-list arguments validate") {
    intercept[IllegalArgumentException] {
      new graft.functions.CountMinAggregator(0, 8)
    }
    intercept[IllegalArgumentException] {
      ApproxOps.cmsPointEstimates(
        ApproxOps.countMinSketch(Seq("a").toDF("w"), col("w"), 2, 8),
        Seq.empty, 2, 8)
    }
  }
}
