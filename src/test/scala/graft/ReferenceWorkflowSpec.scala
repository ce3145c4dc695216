package graft

import org.apache.spark.sql.functions._

import graft.functions.ComplexOps
import graft.operators.{Canvas, LongForm, Raster, ShadePlot, Subset}
import graft.operators.ShadePlot.PlotSpec

/** End-to-end integration of the reference's EP1 pipeline (SURVEY.md §3):
  * `shadems ms.ms -x TIME -y DATA:amp --chan 0:4 --colour-by CORR` —
  * MS-shaped data → flag mask → channel slice → complex amp → categorical
  * raster → shade. Exercises every fidelity-layer piece in one flow.
  */
class ReferenceWorkflowSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic MS: 100 rows × 8 chan × 2 corr, deterministic values. */
  private lazy val ms = {
    val rows = (0 until 100).map { r =>
      val data = Seq.tabulate(8, 2)((c, p) => Seq(math.sin(r + c + p), math.cos(r - c)))
      val flag = Seq.tabulate(8, 2)((c, p) => (r + c + p) % 7 == 0)
      (r.toLong, r.toDouble * 30.0, Seq.tabulate(8)(c => 1.0e9 + c * 1e6), data, flag)
    }
    rows.toDF("row_id", "time", "chan_freq", "data_ri", "flag")
      .withColumn("data", expr(
        "transform(data_ri, chan -> transform(chan, cell -> struct(cell[0] AS re, cell[1] AS im)))"))
      .drop("data_ri")
  }

  test("EP1: explode → flag-mask → chan-slice → amp → categorical raster → eq_hist") {
    val long = LongForm.explodeChanCorr(ms,
      cols2d = Seq("data", "flag"), cols1dChan = Seq("chan_freq"),
      keep = Seq("row_id", "time"))

    assert(long.count() == 100 * 8 * 2)

    val selected = long
      .filter(!col("flag"))                                  // default flag masking
      .filter(Subset.chanSlice("0:4", col("chan")))          // --chan 0:4
      .withColumn("a", ComplexOps.amp(col("data")))          // DATA:amp

    // raster TIME × amp, coloured by corr (the --colour-by CORR plot)
    val spec = PlotSpec(col("time"), col("a"),
      Canvas(32, 32, (0.0, 3000.0), (0.0, 1.5)),
      colourBy = Some(col("corr")))
    val raster = ShadePlot.raster(selected, spec)
    val cats = raster.select("cat").distinct().as[Int].collect().toSet
    assert(cats == Set(0, 1), "both correlations present as categories")
    assert(raster.agg(sum("c")).head().getLong(0) == selected.count())

    // shade the corr-0 plane and check eq_hist invariants
    val shaded = Raster.shadeEqHist(raster.filter(col("cat") === 0), col("c"))
    val shades = shaded.select("shade").as[Double].collect()
    assert(shades.forall(s => s > 0.0 && s <= 1.0))

    // the flag mask dropped exactly the flagged cells in the slice
    val expectDropped = long
      .filter(Subset.chanSlice("0:4", col("chan")) && col("flag")).count()
    assert(selected.count() ==
      long.filter(Subset.chanSlice("0:4", col("chan"))).count() - expectDropped)
  }

  test("uvwave axis over the sliced channels matches row uvdist × freq / c") {
    val long = LongForm.explodeChanCorr(ms,
      cols2d = Seq("data"), cols1dChan = Seq("chan_freq"), keep = Seq("row_id", "time"))
      .withColumn("uvw", LongForm.uvwave(col("time"), col("chan_freq")))
    val r = long.filter(col("row_id") === 2 && col("chan") === 3 && col("corr") === 0)
      .select("uvw").as[Double].head()
    assert(math.abs(r - 60.0 * (1.0e9 + 3e6) / 299792458.0) < 1e-9)
  }
}
