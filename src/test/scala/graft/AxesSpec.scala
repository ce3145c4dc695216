package graft

import org.apache.spark.sql.functions._

import graft.functions.Axes

/** Property-style tests for the axis expression builders (SURVEY.md §5.5):
  * seeded random inputs are evaluated in one Spark pass and compared
  * against a pure-Scala reference implementation. */
class AxesSpec extends SparkSpec {
  import spark.implicits._

  private def refBin(v: Double, lo: Double, hi: Double, n: Int): Int =
    math.min(n - 1, math.max(0, math.floor((v - lo) / (hi - lo) * n).toInt))

  test("bin matches reference on 2000 seeded random points, including out-of-range") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(2000)((rnd.nextDouble() * 200 - 50, 0.0, 100.0, 1 + rnd.nextInt(64)))
    val df = cases.toDF("v", "lo", "hi", "n")
    // group by n so the bin expression gets literal parameters, as in real use
    cases.groupBy(_._4).foreach { case (n, group) =>
      val got = group.toDF("v", "lo", "hi", "n")
        .select(Axes.bin(col("v"), 0.0, 100.0, n).as("b")).as[Int].collect()
      val want = group.map(c => refBin(c._1, 0.0, 100.0, n))
      assert(got.toSeq == want.toSeq)
    }
  }

  test("bin edges: lo → 0, hi clamps to n-1, below-lo clamps to 0") {
    val got = Seq(0.0, 100.0, -5.0, 99.999999, 1e9).toDF("v")
      .select(Axes.bin(col("v"), 0.0, 100.0, 64).as("b")).as[Int].collect().toSeq
    assert(got == Seq(0, 63, 0, 63, 63))
  }

  test("bin survives NaN and huge values under ANSI mode (clamped, no throw)") {
    val got = Seq(Double.NaN, 1e300, -1e300).toDF("v")
      .select(Axes.bin(col("v"), 0.0, 100.0, 64).as("b")).as[Int].collect().toSeq
    assert(got == Seq(0, 63, 0), "NaN lands in bin 0 (documented); huge values clamp")
  }

  test("amp and phase match hand-computed values") {
    val row = Seq((3.0, 4.0)).toDF("re", "im")
      .select(Axes.amp(col("re"), col("im")).as("a"),
        Axes.phase(col("re"), col("im")).as("p"))
      .as[(Double, Double)].head()
    assert(row._1 == 5.0)
    assert(math.abs(row._2 - math.toDegrees(math.atan2(4.0, 3.0))) < 1e-12)
  }
}
