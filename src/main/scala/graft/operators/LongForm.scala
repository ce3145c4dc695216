package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `[row, chan, corr]` → long-form bridge — the Spark-native
  * re-expression of the reference's hardest data-model piece,
  * `shade_ms/dask_utils.py :: dataframe_factory` [U]: broadcast ragged
  * per-row / per-chan / per-corr arrays to a common shape and flatten to
  * one row per (row, chan, corr) cell.
  *
  * One `posexplode` per nesting level (Catalyst Generators, pipelined in
  * codegen); sibling arrays of the same shape are indexed with
  * `element_at` at the already-exploded position instead of a second
  * generator — no join, no shuffle, linear in output size. Per-chan
  * columns (e.g. CHAN_FREQ) broadcast along corr, per-corr columns (e.g.
  * WEIGHT) broadcast along chan, scalars broadcast along both — exactly
  * the reference's broadcasting rule.
  */
object LongForm {

  /** Explode 2-D `[nchan][ncorr]` array columns to long form.
    *
    * @param df        input
    * @param cols2d    columns shaped array[nchan][ncorr] (DATA, FLAG, …)
    * @param cols1dChan columns shaped array[nchan] (CHAN_FREQ, …)
    * @param cols1dCorr columns shaped array[ncorr] (WEIGHT, CORR_TYPE, …)
    * @param keep      scalar row columns carried through (TIME, ANTENNA1…)
    * @return one row per (row, chan, corr): keep ++ (chan, corr) ++ cell
    *         values under the original column names
    */
  def explodeChanCorr(
      df: DataFrame,
      cols2d: Seq[String],
      cols1dChan: Seq[String] = Nil,
      cols1dCorr: Seq[String] = Nil,
      keep: Seq[String] = Nil): DataFrame = {
    require(cols2d.nonEmpty, "need at least one [nchan][ncorr] column to drive the explode")
    val lead = cols2d.head

    // level 1: explode chan out of the lead column; index siblings at chan
    val step1 = df.select(
      keep.map(col) ++
        Seq(posexplode(col(lead)).as(Seq("chan", s"__row_$lead"))) ++
        cols2d.tail.map(c => col(c)) ++
        cols1dChan.map(c => col(c)) ++
        cols1dCorr.map(c => col(c)): _*)
      .select(
        keep.map(col) ++
          Seq(col("chan"), col(s"__row_$lead")) ++
          cols2d.tail.map(c => element_at(col(c), col("chan") + 1).as(s"__row_$c")) ++
          cols1dChan.map(c => element_at(col(c), col("chan") + 1).as(c)) ++
          cols1dCorr.map(c => col(c)): _*)

    // level 2: explode corr out of the lead row; index siblings at corr
    step1.select(
      keep.map(col) ++
        Seq(col("chan"), posexplode(col(s"__row_$lead")).as(Seq("corr", lead))) ++
        cols2d.tail.map(c => col(s"__row_$c")) ++
        cols1dChan.map(c => col(c)) ++
        cols1dCorr.map(c => col(c)): _*)
      .select(
        keep.map(col) ++
          Seq(col("chan"), col("corr"), col(lead)) ++
          cols2d.tail.map(c => element_at(col(s"__row_$c"), col("corr") + 1).as(c)) ++
          cols1dChan.map(c => col(c)) ++
          cols1dCorr.map(c => element_at(col(c), col("corr") + 1).as(c)): _*)
  }

  /** `uvwave` axis mapper [U]: uv-distance in wavelengths — a row-level
    * value broadcast against the per-channel frequency. Call AFTER
    * [[explodeChanCorr]] with the freq column in `cols1dChan`. */
  def uvwave(uvdist: Column, chanFreq: Column): Column =
    uvdist * chanFreq / lit(299792458.0)
}
