package graft

import org.apache.spark.sql.functions._

import graft.operators.{ApproxOps, Canvas, Raster}

class ApproxOpsSpec extends SparkSpec {
  import spark.implicits._

  test("approxDistinct (incl. pair struct) is within rsd of the exact Q14 counts") {
    val exact = sf0001.lineitem.agg(
      countDistinct(col("l_suppkey")), countDistinct(col("l_partkey")),
      countDistinct(col("l_suppkey"), col("l_partkey")))
      .as[(Long, Long, Long)].head()
    val approxDf = ApproxOps.approxDistinct(sf0001.lineitem, 0.02,
      "ds" -> col("l_suppkey"), "dp" -> col("l_partkey"),
      "dpair" -> struct(col("l_suppkey"), col("l_partkey")))
    assert(approxDf.columns.toSeq == Seq("ds", "dp", "dpair"), "aliases preserved")
    val approx = approxDf.as[(Long, Long, Long)].head()
    assert(math.abs(approx._1 - exact._1).toDouble / exact._1 < 0.1)
    assert(math.abs(approx._2 - exact._2).toDouble / exact._2 < 0.1)
    assert(math.abs(approx._3 - exact._3).toDouble / exact._3 < 0.1)
    intercept[IllegalArgumentException](ApproxOps.approxDistinct(sf0001.lineitem, 0.02))
  }

  test("groupPercentiles: approx default tracks the exact opt-in within the rank-error band") {
    // the operator API's default (mergeable sketch) vs its exact opt-in
    // (the q45 gate path) on the same grouping. percentile_approx
    // guarantees rank error <= n/accuracy; convert to a value band by
    // bracketing with exact percentiles at p +/- 0.01 (>> 1/10000, so
    // the assertion is loose enough to never flake yet pins the sketch
    // to the right quantile neighborhood). Deterministic: both sides are
    // deterministic aggregates over the same data.
    val ps = Seq(0.25, 0.5, 0.75)
    val exact = ApproxOps.groupPercentiles(
      sf0001.lineitem, Seq("l_returnflag"), col("l_extendedprice"),
      Seq(0.24, 0.26, 0.49, 0.51, 0.74, 0.76), exact = true)
    val approx = ApproxOps.groupPercentiles(
      sf0001.lineitem, Seq("l_returnflag"), col("l_extendedprice"), ps)
    assert(approx.columns.toSeq == Seq("l_returnflag", "p25", "p50", "p75"))
    val lo = Map("p25" -> "p24", "p50" -> "p49", "p75" -> "p74")
    val hi = Map("p25" -> "p26", "p50" -> "p51", "p75" -> "p76")
    val ex = exact.collect().map(r => r.getString(0) -> r).toMap
    approx.collect().foreach { r =>
      val e = ex(r.getString(0))
      Seq("p25", "p50", "p75").foreach { c =>
        val v = r.getAs[Double](c)
        val (l, h) = (e.getAs[Double](lo(c)), e.getAs[Double](hi(c)))
        assert(v >= l && v <= h,
          s"${r.getString(0)}.$c: sketch $v outside exact band [$l, $h]")
      }
    }
    // ungrouped (global) percentiles work too
    val g = ApproxOps.groupPercentiles(
      sf0001.lineitem, Nil, col("l_extendedprice"), Seq(0.5))
    assert(g.columns.toSeq == Seq("p50") && g.count() == 1)
    // column names come from the DECIMAL value, not the IEEE product:
    // 0.07 * 100 is 7.000000000000001 as a double
    val names = ApproxOps.groupPercentiles(
      sf0001.lineitem, Nil, col("l_extendedprice"), Seq(0.07, 0.999)).columns.toSeq
    assert(names == Seq("p7", "p99_9"), s"got $names")
    intercept[IllegalArgumentException](
      ApproxOps.groupPercentiles(sf0001.lineitem, Nil, col("l_tax"), Nil))
  }

  test("q14's HLL drop-in: approxDistinct reproduces the exact three-way distinct shape") {
    // The documented contract cost (BASELINE.md q14): the exact
    // three-distinct form is permanently >2x the single-pass DuckDB
    // baseline under the local job floor; THIS is the drop-in the
    // operator library ships for when the contract relaxes — one
    // aggregate pass, no distinct shuffle, partials merge as sketches.
    val approx = ApproxOps.approxDistinct(sf0001.lineitem, 0.02,
      "ds" -> col("l_suppkey"), "dp" -> col("l_partkey"),
      "dpair" -> struct(col("l_suppkey"), col("l_partkey")))
    val exact = Queries.q14(sf0001).as[(Long, Long, Long)].head()
    val a = approx.as[(Long, Long, Long)].head()
    assert(math.abs(a._1 - exact._1).toDouble / exact._1 < 0.1, s"ds $a vs $exact")
    assert(math.abs(a._2 - exact._2).toDouble / exact._2 < 0.1, s"dp $a vs $exact")
    assert(math.abs(a._3 - exact._3).toDouble / exact._3 < 0.1, s"dpair $a vs $exact")
  }

  test("kmvSketch: under-full sketch is the exact distinct set; estimate is exact") {
    val items = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "w")
    val sk = ApproxOps.kmvSketch(items, col("g"), col("w"), k = 64)
    val perGroup = sk.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(perGroup == Map("a" -> 2L, "b" -> 1L), s"got $perGroup")
    val est = sk.groupBy("grp")
      .agg(count(lit(1)).as("n"), max("h").as("hmax"))
      .select(col("grp"), ApproxOps.kmvEstimate(col("n"), col("hmax"), 64).as("e"))
      .as[(String, Double)].collect().toMap
    assert(est == Map("a" -> 2.0, "b" -> 1.0), s"got $est")
    intercept[IllegalArgumentException](
      ApproxOps.kmvSketch(items, col("g"), col("w"), k = 1))
  }

  test("kmvMerge: bottom-k of unioned sketches == sketch of unioned raw data") {
    val day1 = (0 until 300).map(i => ("d", s"w$i")).toDF("g", "w")
    val day2 = (200 until 500).map(i => ("d", s"w$i")).toDF("g", "w")
    val k = 32
    val merged = ApproxOps.kmvMerge(
      ApproxOps.kmvSketch(day1, col("g"), col("w"), k)
        .union(ApproxOps.kmvSketch(day2, col("g"), col("w"), k)), k)
    val direct = ApproxOps.kmvSketch(
      day1.union(day2), col("g"), col("w"), k)
    assert(merged.as[(String, String)].collect().toSet ==
      direct.as[(String, String)].collect().toSet,
      "merge must equal the sketch of the union (semilattice identity)")
  }

  test("kmvEstimate on a full sketch lands within the ~1/sqrt(k-2) error band") {
    val n = 2000
    val k = 64
    val items = (0 until n).map(i => ("g", s"item_$i")).toDF("g", "w")
    val sk = ApproxOps.kmvSketch(items, col("g"), col("w"), k)
    val est = sk.groupBy("grp")
      .agg(count(lit(1)).as("ns"), max("h").as("hmax"))
      .select(ApproxOps.kmvEstimate(col("ns"), col("hmax"), k))
      .as[Double].head()
    // 3-sigma of the textbook relative error 1/sqrt(k-2) ~ 0.127 → 38%;
    // deterministic given md5, so this can never flake
    assert(math.abs(est - n) / n < 0.38, s"estimate $est vs exact $n")
  }

  test("q111's cumulative KMV estimate tracks the exact distinct-trigram count (fixture pin)") {
    // the accuracy-vs-exact pin that rode along inside q111 until r17:
    // the exact cumulative recount (full distinct-trigram scan × 10
    // broadcast days) is gate-side context, not operator work, so it
    // lives here at fixture scale instead of in the bench-visible query.
    // Deterministic given md5 — exact values pinned, not just the band.
    import graft.functions.TextOps
    val k = 64
    val sh = sf0001.documents.select((col("doc_id") % 10).as("slice"),
      explode(TextOps.shinglesNative(TextOps.tokens(col("text")), 3)).as("w"))
    val est = graft.PipelineQueries.q111(sf0001)
      .select("day", "est_cum").as[(Long, Double)].collect().toMap
    val exact = sh.select(col("slice"), md5(col("w")).as("h")).distinct()
      .groupBy("h").agg(min("slice").as("fs"))
      .select(col("fs")).as[Long].collect()
    val days = est.keys.toSeq.sorted
    for (d <- days) {
      val ex = exact.count(_ <= d)
      val e = est(d)
      assert(ex > 0, s"day $d has no trigrams")
      // full sketches honor the 3-sigma band of 1/sqrt(k-2); under-full
      // sketches are exact by construction
      assert(math.abs(e - ex) / ex < 0.38,
        s"day $d: estimate $e vs exact $ex drifts past the 3-sigma band")
    }
    assert(days.nonEmpty)
  }

  test("Canvas.auto handles integer axes, empty selections, and huge-magnitude values") {
    // long/int axes: min/max preserve input type; auto must cast
    val c = Canvas.auto(sf0001.lineitem, col("l_suppkey"), col("l_linenumber"), 8, 8)
    assert(c.xRange._2 > c.xRange._1 && c.yRange._2 > c.yRange._1)
    // empty selection → clear error, not an NPE
    val err = intercept[IllegalArgumentException](
      Canvas.auto(sf0001.lineitem.filter(lit(false)), col("l_quantity"), col("l_tax"), 8, 8))
    assert(err.getMessage.contains("no data"))
    // large-magnitude constant axis: epsilon must survive fp rounding
    val big = spark.range(5).select((col("id") * 0 + 1e12).as("v"))
    val cb = Canvas.auto(big, col("v"), col("v"), 4, 4)
    assert(cb.xRange._2 > cb.xRange._1, "ulp-floor epsilon must widen 1e12")
    val bins = big.select(cb.xBin(col("v"))).distinct().collect().map(_.getInt(0)).toSet
    assert(bins == Set(0))
  }

  test("Canvas.auto computes ranges covering every point (no edge clamp)") {
    val c = Canvas.auto(sf0001.lineitem, col("l_quantity"), col("l_extendedprice"), 16, 16)
    val r = sf0001.lineitem.agg(
      min(c.xBin(col("l_quantity"))), max(c.xBin(col("l_quantity"))),
      min(c.yBin(col("l_extendedprice"))), max(c.yBin(col("l_extendedprice"))))
      .as[(Int, Int, Int, Int)].head()
    assert(r._1 == 0 && r._2 == 15 && r._3 == 0 && r._4 == 15,
      "auto range must span exactly the full bin range")
    // the max point must land in the last bin by range, not by clamping:
    // widen() puts max strictly inside [lo, hi)
    val (_, hi) = c.xRange
    val mx = sf0001.lineitem.agg(max("l_quantity")).head().getDouble(0)
    assert(mx < hi)
  }

  test("shadeEqHistApprox tracks exact eq_hist within a coarse tolerance") {
    val raster = Canvas(16, 16, (0.0, 50.0), (900.0, 105000.0))
      .points(sf0001.lineitem, col("l_quantity"), col("l_extendedprice"))
    val exact = Raster.shadeEqHist(raster, col("c"))
      .select(col("xb"), col("yb"), col("shade")).as[(Int, Int, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val approx = ApproxOps.shadeEqHistApprox(raster, col("c"), breaks = 64)
      .select(col("xb"), col("yb"), col("shade")).as[(Int, Int, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (x, y, s) =>
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - exact((x, y))) < 0.15, s"cell ($x,$y): approx $s vs ${exact((x, y))}")
    }
  }
}
