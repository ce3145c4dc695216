package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-series shaping operators: regular-grid densification (calendar
  * gap fill) and forward fill. The reference plots time axes straight from
  * the data ([U] `data_mappers.py` time mapper); a training/feature
  * pipeline additionally needs the *absent* buckets materialized (a model
  * reading "no events this hour" must see an explicit zero row) and
  * missing measurements carried forward.
  */
object TimeSeries {

  /** Dense time grid: one row per `step` from min to max of `tsExpr` over
    * `src`, inclusive. The bounds aggregate is a full-reduce to one row
    * (partial min/max per partition, tiny exchange), and the grid explodes
    * from that single row — O(grid length) rows out regardless of input
    * size, so the grid side of [[gapFill]] is always bounded. */
  def grid(src: DataFrame, tsExpr: Column, step: String, as: String = "g"): DataFrame = {
    // `step` is interpolated into SQL text — validate it here so a typo (or
    // a quote) fails at the call site with a clear message instead of an
    // opaque parse error (or an injected fragment) deep in analysis
    require(step.matches("""(?i)\d+\s+(SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|YEAR)S?"""),
      s"grid step must look like '<n> SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|YEAR', got: '$step'")
    src.agg(min(tsExpr).as("mn"), max(tsExpr).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr(s"INTERVAL '$step'"))).as(as))
  }

  /** Left-join bucket-aggregated `dataAgg` onto the dense grid, filling
    * the named columns where the data has no bucket. `dataAgg` is grouped
    * by the same bucket expression as the grid, so it is bounded by the
    * grid length — broadcast it and the fill is shuffle-free. */
  def gapFill(gridDf: DataFrame, dataAgg: DataFrame, key: String,
      fills: Map[String, Column]): DataFrame = {
    val unknown = fills.keySet -- dataAgg.columns.toSet - key
    require(unknown.isEmpty,
      s"gapFill fills reference columns not in the data side: ${unknown.mkString(", ")} " +
      s"(have: ${dataAgg.columns.mkString(", ")}) — a typo here would silently leave NULLs")
    val filled = dataAgg.columns.filterNot(_ == key).map { c =>
      fills.get(c).map(d => coalesce(col(c), d)).getOrElse(col(c)).as(c)
    }
    gridDf.join(broadcast(dataAgg), Seq(key), "left")
      .select(col(key) +: filled: _*)
  }

  /** Forward fill: latest preceding non-null value of `value` within the
    * window's partition/ordering (SQL `last_value(x IGNORE NULLS)`). */
  def forwardFill(value: Column, over: WindowSpec): Column =
    last(value, ignoreNulls = true)
      .over(over.rowsBetween(Window.unboundedPreceding, Window.currentRow))
}
