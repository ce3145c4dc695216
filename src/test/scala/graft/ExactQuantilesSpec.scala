package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ExactQuantiles

/** [[graft.operators.ExactQuantiles]] — the r20 distributed replacement
  * for the builtin imperative `percentile` aggregate — must be
  * BIT-IDENTICAL to the builtin on every input class the interpolation
  * branches distinguish: unique values, heavy ties, integral positions,
  * n = 1, n < |fracs|, weighted pre-counts, and a real corpus column.
  * The comparison is on raw `Double.doubleToLongBits`, not a tolerance:
  * ksDriftBinned's bin membership tests `v > edge`, so one flipped ulp
  * could move a row across a bin. */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(df: DataFrame, fracs: Seq[Double]): Seq[Double] = {
    val arr = fracs.map(p => s"CAST(${p}D AS DOUBLE)").mkString(", ")
    df.agg(expr(s"percentile(v, array($arr))").as("e"))
      .head().getSeq[Double](0)
  }

  private def distributed(df: DataFrame, fracs: Seq[Double]): Seq[Double] =
    ExactQuantiles.quantileEdges(df, col("v"), fracs, "e")
      .head().getSeq[Double](0)

  private def assertBitIdentical(df: DataFrame, fracs: Seq[Double],
      clue: String): Unit = {
    val a = builtin(df, fracs)
    val b = distributed(df, fracs)
    assert(a.length == b.length, s"$clue: length ${a.length} vs ${b.length}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y),
        s"$clue: frac #$i builtin=$x distributed=$y")
    }
  }

  private val fracs31 = (1 until 32).map(_.toDouble / 32)
  private val fracsOdd = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  test("unique continuous values match the builtin bit-for-bit") {
    val df = (1 to 997).map(i => ((i * 7919 % 1009) + 0.125 * i)).toDF("v")
    assertBitIdentical(df, fracs31, "unique")
    assertBitIdentical(df, fracsOdd, "unique/odd fracs")
  }

  test("heavy ties (few distinct values, skewed counts)") {
    val df = (Seq.fill(500)(1.0) ++ Seq.fill(3)(2.5) ++ Seq.fill(200)(7.0) ++
      Seq.fill(1)(9.25)).toDF("v")
    assertBitIdentical(df, fracs31, "ties")
    assertBitIdentical(df, fracsOdd, "ties/odd fracs")
  }

  test("integral positions (n-1 divisible by the frac denominators)") {
    // n = 33 → pos = k*(32)/32 = k exactly: the h == l early-return branch
    val df = (0 until 33).map(i => i * 1.5).toDF("v")
    assertBitIdentical(df, fracs31, "integral")
  }

  test("n = 1 and n < |fracs| degenerate sizes") {
    assertBitIdentical(Seq(42.75).toDF("v"), fracs31, "n=1")
    assertBitIdentical(Seq(1.0, 2.0, 3.0).toDF("v"), fracs31, "n=3")
  }

  test("nulls are ignored exactly like the builtin") {
    val df = (Seq[Option[Double]](Some(1.0), None, Some(2.0), None, Some(5.5)))
      .toDF("v")
    assertBitIdentical(df, fracsOdd, "nulls")
  }

  test("weighted pre-counted form equals the raw form") {
    val raw = (Seq.fill(10)(1.0) ++ Seq.fill(5)(3.5) ++ Seq.fill(7)(9.0)).toDF("v")
    val counted = Seq((1.0, 10L), (3.5, 5L), (9.0, 7L)).toDF("v", "w")
    val a = distributed(raw, fracsOdd)
    val b = ExactQuantiles.quantileEdgesWeighted(counted, col("v"), col("w"),
      fracsOdd, "e").head().getSeq[Double](0)
    assert(a == b, s"weighted: $a vs $b")
  }

  test("duplicate value rows in the pre-counted input are re-aggregated") {
    val counted = Seq((1.0, 4L), (1.0, 6L), (3.5, 5L)).toDF("v", "w")
    val raw = (Seq.fill(10)(1.0) ++ Seq.fill(5)(3.5)).toDF("v")
    val a = ExactQuantiles.quantileEdgesWeighted(counted, col("v"), col("w"),
      fracsOdd, "e").head().getSeq[Double](0)
    val b = distributed(raw, fracsOdd)
    assert(a == b, s"dup pre-counts: $a vs $b")
  }

  test("lineitem extendedprice at sf0.001 — the q185 input class") {
    val df = sf0001.lineitem.select(col("l_extendedprice").cast("double").as("v"))
    assertBitIdentical(df, fracs31, "lineitem")
  }

  test("empty input yields one row with an empty array (documented divergence)") {
    val df = Seq.empty[Double].toDF("v")
    val out = ExactQuantiles.quantileEdges(df, col("v"), fracsOdd, "e").collect()
    assert(out.length == 1 && out(0).getSeq[Double](0).isEmpty)
  }
}
