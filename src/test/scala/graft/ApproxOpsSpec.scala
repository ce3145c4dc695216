package graft

import org.apache.spark.sql.functions._

import graft.operators.{ApproxOps, Canvas, Raster}

class ApproxOpsSpec extends SparkSpec {
  import spark.implicits._

  test("approxDistinct is within rsd of the exact Q14 counts") {
    val exact = sf0001.lineitem.agg(
      countDistinct(col("l_suppkey")), countDistinct(col("l_partkey")))
      .as[(Long, Long)].head()
    val approx = ApproxOps.approxDistinct(
      sf0001.lineitem, 0.02, col("l_suppkey"), col("l_partkey"))
      .as[(Long, Long)].head()
    assert(math.abs(approx._1 - exact._1).toDouble / exact._1 < 0.1)
    assert(math.abs(approx._2 - exact._2).toDouble / exact._2 < 0.1)
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
