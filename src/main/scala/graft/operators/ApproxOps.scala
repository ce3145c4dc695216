package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Approximate variants for the 100 TB path (SURVEY.md §7 "hard parts" #6):
  * the exact operators (Q14 distinct counts, Q09 ranges, eq_hist) are the
  * correctness gates; these are the drop-in replacements when a full
  * shuffle of distinct values or a global sort is no longer affordable.
  *
  *  - `approx_count_distinct` (HyperLogLog++): no distinct shuffle at all —
  *    partial sketches merge associatively, so the exchange carries one
  *    sketch per partition instead of every distinct value;
  *  - `percentile_approx` (KLL-style sketch): quantile ranges and
  *    histogram-equalization breakpoints without a global sort.
  */
object ApproxOps {

  /** HLL distinct counts, aliased like the exact aggregate they replace.
    * Multi-column (pair) distincts are expressed as a struct column:
    * `"dpair" -> struct(col("a"), col("b"))` (Q14's dpair analogue). */
  def approxDistinct(df: DataFrame, rsd: Double, cols: (String, Column)*): DataFrame = {
    require(cols.nonEmpty, "approxDistinct needs at least one (alias, column) pair")
    val aggs = cols.map { case (name, c) => approx_count_distinct(c, rsd).as(name) }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate axis range: (p_lo, p_hi) quantiles instead of min/max —
    * also the robust-range variant for outlier-heavy axes. */
  def approxRange(c: Column, pLo: Double, pHi: Double,
      accuracy: Int = 10000): Column =
    percentile_approx(c, array(lit(pLo), lit(pHi)), lit(accuracy))

  /** Approximate eq_hist: shade = interpolated rank of a cell's count among
    * `breaks` quantile breakpoints of the count distribution, computed from
    * a sketch rather than a global cume_dist sort. For canvas-sized rasters
    * the exact `Raster.shadeEqHist` is fine; this is for giant (or
    * per-category stacked) rasters.
    *
    * The raster is persisted for the duration of the two passes (sketch +
    * shade) so the upstream lineage — potentially a full input scan — runs
    * once; callers may `unpersist()` the input afterwards. */
  def shadeEqHistApprox(raster: DataFrame, countCol: Column, breaks: Int = 64): DataFrame = {
    raster.persist(StorageLevel.MEMORY_AND_DISK)
    val qs = raster.select(
      percentile_approx(countCol, array((1 to breaks).map(i => lit(i.toDouble / breaks)): _*),
        lit(10000)).as("__graft_qs"))
    raster.crossJoin(broadcast(qs))
      .withColumn("shade",
        (aggregate(col("__graft_qs"), lit(0), (acc, q) => acc + when(countCol >= q, 1).otherwise(0))
          / lit(breaks.toDouble)))
      .drop("__graft_qs")
  }
}
