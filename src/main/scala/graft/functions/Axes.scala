package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Axis-expression builders — the Spark-native analogue of the reference's
  * `DataMapper` registry (`shade_ms/data_mappers.py :: data_mappers` [U]):
  * named scalar derivations over raw columns (amplitude, phase, uv distance,
  * linear binning). Everything here composes Spark built-in expressions so
  * the whole derivation stays inside whole-stage codegen — no UDFs.
  */
object Axes {

  /** Complex amplitude `|z| = sqrt(re² + im²)`
    * (reference: `data_mappers['amp']` [U]). */
  def amp(re: Column, im: Column): Column = sqrt(re * re + im * im)

  /** Complex phase in degrees (`data_mappers['phase']` [U]). */
  def phase(re: Column, im: Column): Column = degrees(atan2(im, re))

  /** Euclidean distance from origin — uv-distance analogue
    * (`data_mappers['uvdist']` [U]). */
  def dist(u: Column, v: Column): Column = sqrt(u * u + v * v)

  /** Linear bin index for raster aggregation: maps `c` in `[lo, hi)` onto
    * `n` left-closed bins, clamping out-of-range values to the edge bins —
    * exactly datashader's `Canvas` linear axis discretization
    * (`datashader.Canvas.points` glyph kernel [U]).
    *
    * The arithmetic shape `(c - lo) / (hi - lo) * n` is kept verbatim so the
    * result is bit-identical with the declared oracle SQL.
    *
    * Clamping happens in DOUBLE, before the int cast: under Spark 4's
    * default ANSI mode a NaN axis value (or a bin index beyond int range)
    * would otherwise throw in the cast before least/greatest could clamp
    * it. A NaN axis value is mapped to bin 0 by an explicit `isnan` guard
    * (datashader drops NaN points; we keep the row but give it a defined
    * bin so the operator is total — callers mirroring datashader's
    * NaN-drop semantics should filter `isnan` upstream). The guard exists
    * because least/greatest NaN propagation would otherwise decide the
    * bin implicitly (NaN sorts above all doubles in Spark, which would
    * send NaN to the LAST bin — surprising and engine-specific). */
  def bin(c: Column, lo: Double, hi: Double, n: Int): Column =
    when(isnan(c), lit(0))
      .otherwise(
        least(lit((n - 1).toDouble),
            greatest(lit(0.0), floor((c - lit(lo)) / (lit(hi) - lit(lo)) * n)))
          .cast("int"))
}
