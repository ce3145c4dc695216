package graft

import org.apache.spark.sql.functions._

import graft.operators.LongForm

/** MS-shaped fixture tests for the dataframe_factory analogue. */
class LongFormSpec extends SparkSpec {
  import spark.implicits._

  // 2 rows × 2 chan × 2 corr, with per-chan freqs and per-corr weights
  private val ms = Seq(
    (0L, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(Seq(false, true), Seq(false, false)),
      Seq(1.0e9, 1.1e9), Seq(0.5, 0.25), 100.0),
    (1L, Seq(Seq(5.0, 6.0), Seq(7.0, 8.0)), Seq(Seq(true, true), Seq(true, true)),
      Seq(1.0e9, 1.1e9), Seq(1.0, 1.0), 200.0)
  ).toDF("row_id", "data", "flag", "chan_freq", "weight", "uvdist")

  test("explodeChanCorr flattens [row,chan,corr] with correct broadcasting") {
    val long = LongForm.explodeChanCorr(ms,
      cols2d = Seq("data", "flag"),
      cols1dChan = Seq("chan_freq"),
      cols1dCorr = Seq("weight"),
      keep = Seq("row_id", "uvdist"))
    assert(long.count() == 8, "2 rows × 2 chan × 2 corr")
    val got = long.select("row_id", "chan", "corr", "data", "flag", "chan_freq", "weight")
      .as[(Long, Int, Int, Double, Boolean, Double, Double)].collect().toSet
    assert(got.contains((0L, 0, 1, 2.0, true, 1.0e9, 0.25)))
    assert(got.contains((0L, 1, 0, 3.0, false, 1.1e9, 0.5)))
    assert(got.contains((1L, 1, 1, 8.0, true, 1.1e9, 1.0)))
  }

  test("flag masking after explode drops exactly the flagged cells") {
    val long = LongForm.explodeChanCorr(ms, Seq("data", "flag"), keep = Seq("row_id"))
    assert(long.filter(!col("flag")).count() == 3) // row 0 has 3 unflagged cells
  }

  test("uvwave broadcasts row-level uvdist against per-chan frequency") {
    val long = LongForm.explodeChanCorr(ms,
      cols2d = Seq("data"), cols1dChan = Seq("chan_freq"), keep = Seq("row_id", "uvdist"))
      .withColumn("uvw", LongForm.uvwave(col("uvdist"), col("chan_freq")))
    val r = long.filter(col("row_id") === 0 && col("chan") === 1)
      .select("uvw").as[Double].head()
    assert(math.abs(r - 100.0 * 1.1e9 / 299792458.0) < 1e-9)
  }
}
