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
