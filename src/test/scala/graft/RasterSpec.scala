package graft

import org.apache.spark.sql.functions._

import graft.operators.{Canvas, Raster}

class RasterSpec extends SparkSpec {
  import spark.implicits._

  private val canvas = Canvas(4, 4, (0.0, 4.0), (0.0, 4.0))

  test("points: hand-computed 4x4 count raster") {
    val df = Seq((0.5, 0.5), (0.5, 0.7), (3.9, 3.9), (7.0, -1.0)).toDF("x", "y")
    val got = canvas.points(df, col("x"), col("y"))
      .orderBy("xb", "yb").as[(Int, Int, Long)].collect().toSeq
    // (0.5,0.5) and (0.5,0.7) share bin (0,0); (3.9,3.9)→(3,3); (7,-1) clamps →(3,0)
    assert(got == Seq((0, 0, 2L), (3, 0, 1L), (3, 3, 1L)))
  }

  test("conjugate union doubles the point count and rasters origin-symmetrically") {
    val df = sf0001.lineitem.limit(500)
      .select((col("l_discount") - 0.05).as("x"), (col("l_tax") - 0.04).as("y"))
    val mirrored = df.union(df.select((-col("x")).as("x"), (-col("y")).as("y")))
    assert(mirrored.count() == 2 * df.count())
    // 13 bins over ±0.065 put 0 at a bin CENTER: fixture values are
    // multiples of 0.01, so no point lies on a bin edge — a left-closed
    // grid only mirrors exactly when nothing sits on an edge.
    val c = Canvas(13, 13, (-0.065, 0.065), (-0.065, 0.065))
    val raster = c.points(mirrored, col("x"), col("y"))
      .as[(Int, Int, Long)].collect().map { case (x, y, n) => ((x, y), n) }.toMap
    raster.foreach { case ((x, y), n) =>
      assert(raster.getOrElse((12 - x, 12 - y), 0L) == n, s"asymmetry at ($x,$y)")
    }
  }

  test("eq_hist shade: in (0,1], monotone non-decreasing in count, ties share shade") {
    val df = Seq((0.5, 0.5), (0.5, 0.6), (1.5, 1.5), (2.5, 2.5), (3.5, 3.5)).toDF("x", "y")
    val shaded = Raster.shadeEqHist(canvas.points(df, col("x"), col("y")), col("c"))
      .select(col("c").cast("long"), col("shade")).as[(Long, Double)].collect().sortBy(_._1)
    assert(shaded.forall { case (_, s) => s > 0.0 && s <= 1.0 })
    assert(shaded.sliding(2).forall { case Array((c1, s1), (c2, s2)) => c1 > c2 || s1 <= s2; case _ => true })
    val byCount = shaded.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
    assert(byCount.values.forall(_.size == 1), "equal counts must share a shade")
  }
}
