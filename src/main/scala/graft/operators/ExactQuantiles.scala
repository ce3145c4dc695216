package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT quantile edges as a DISTRIBUTED plan — a drop-in replacement for
  * `agg(percentile(v, array(fracs)))` that computes bit-identical edges
  * without the builtin's scale hazard (optimization r20).
  *
  * Why: Spark's `Percentile` is an imperative `TypedAggregate` — every
  * input row pays a boxed `OpenHashMap[Double, Long]` update outside
  * whole-stage codegen, the per-partition maps (distinct-value-sized, so
  * data-sized on a continuous column) are serialized into ONE final
  * buffer, and that single buffer is sorted single-threaded. Measured at
  * sf0.1 (600 k rows, 31 fracs): 3.2–4.6 s for the aggregate alone —
  * ~5 µs/row — and the ×30 drift soak paid 29 s on an 18 M-row column.
  * This plan does the same work as a handful of codegen'd relational
  * stages, every one of them parallel and none of them holding more
  * than one range partition of the DISTINCT-value table:
  *
  *  1. `groupBy(v).sum(w)` — the only corpus-sized pass (partial+final
  *     hash aggregate, map-side combined);
  *  2. `repartitionByRange(v) + sortWithinPartitions` — the parallel
  *     global sort of the distinct-value table ([[Discretize]]'s
  *     range-rank idiom; persisted so both consumers below see ONE
  *     range-boundary instantiation — RangePartitioner samples with an
  *     RDD-id-derived seed, so an unpinned re-execution could place
  *     rows differently and the offsets would lie);
  *  3. per-partition weight sums → a PARTITION-COUNT-sized offset table
  *     (the single-partition windows run over ~8 rows, never data);
  *  4. each distinct value's global 0-based rank span `[lo, hi)` =
  *     broadcast offset + local running sum — one keyed window per
  *     range partition;
  *  5. the `fracs` targets (bounded) compute `pos = (n−1)·p`, bracket
  *     ranks `l = floor(pos)`, `h = ceil(pos)`, and a broadcast join
  *     picks the two bracketing values out of the span table;
  *  6. the interpolation replays `Percentile.getPercentile`'s exact
  *     branch structure and IEEE operation order (verified against the
  *     Spark 4.1.2 bytecode):
  *       - `pos = (n − 1).toDouble * p`; `l = floor(pos).toLong`,
  *         `h = ceil(pos).toLong`;
  *       - `h == l`            → value at rank l;
  *       - value(l) == value(h) → value at rank l;
  *       - else `(h − pos) · v_l + (pos − l) · v_h` (multiply, multiply,
  *         add — the same three ops in the same order).
  *
  * Every aggregate here sums exact LONG weights, so the result is
  * partitioning- and merge-order-independent by construction — stronger
  * than the builtin needs to promise.
  *
  * Divergences from the builtin (all irrelevant to the gated callers,
  * stated for honesty):
  *  - empty input yields one row with an EMPTY array, not a NULL array
  *    (both gated consumers raise loudly on empty input anyway);
  *  - a column containing BOTH `-0.0` and `0.0` would group them as one
  *    value where the builtin's boxed map keeps two (SQL equality vs
  *    `Double.equals`); no gated column can produce a signed zero;
  *  - NaN ordering follows SQL semantics (NaN greatest), matching the
  *    builtin's `TotalOrdering` — but callers filter nulls/NaNs.
  *
  * Scale: the builtin funnels the whole distinct-value table through one
  * aggregation buffer (the honest q45 caveat of rounds ≤19); here the
  * distinct table stays range-partitioned across the cluster and only
  * partition-count-sized and fracs-sized relations are ever broadcast.
  */
object ExactQuantiles {

  /** One-row frame `(out: array<double>)` ≡
    * `df.agg(percentile(value, array(fracs)))` over non-NULL values. */
  def quantileEdges(df: DataFrame, value: Column, fracs: Seq[Double],
      out: String): DataFrame = {
    val v = df.select(value.cast("double").as("__eq_v"))
      .filter(col("__eq_v").isNotNull)
      .groupBy("__eq_v").agg(count(lit(1)).as("__eq_c"))
    quantileEdgesWeighted(v, col("__eq_v"), col("__eq_c"), fracs, out)
  }

  /** [[quantileEdges]] over a PRE-COUNTED `(value, weight)` table — the
    * entry for callers that already hold a distinct-value histogram
    * (e.g. [[TimeSeries.ksDriftBinned]]'s shared (group, value) counts:
    * one corpus scan serves both the edges and the binning). Values need
    * not be distinct (an internal re-aggregate makes the contract
    * robust); weights must be positive counts. */
  def quantileEdgesWeighted(counts: DataFrame, value: Column, weight: Column,
      fracs: Seq[Double], out: String): DataFrame = {
    require(fracs.nonEmpty, "quantileEdges needs at least one fraction")
    require(fracs.forall(p => p >= 0.0 && p <= 1.0),
      s"fractions must be in [0, 1], got $fracs")
    val ranked = counts
      .select(value.cast("double").as("__eq_v"), weight.cast("long").as("__eq_c"))
      .filter(col("__eq_v").isNotNull)
      .groupBy("__eq_v").agg(sum("__eq_c").as("__eq_c"))
      .repartitionByRange(col("__eq_v"))
      .sortWithinPartitions("__eq_v")
      .withColumn("__eq_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // partition-count-sized offsets (the Discretize step-3 idiom): the
    // single-partition windows below run over ~shuffle-partition rows
    val offs = ranked.groupBy("__eq_pid").agg(sum("__eq_c").as("__eq_pc"))
      .withColumn("__eq_off", coalesce(sum("__eq_pc").over(
        Window.orderBy("__eq_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__eq_n", sum("__eq_pc").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__eq_pid"), col("__eq_off"), col("__eq_n"))
    // each distinct value's global 0-based rank span [lo, hi)
    val spans = ranked
      .withColumn("__eq_loc", sum("__eq_c").over(
        Window.partitionBy("__eq_pid").orderBy("__eq_v")))
      .join(broadcast(offs), Seq("__eq_pid"))
      .select(col("__eq_v"),
        (col("__eq_off") + col("__eq_loc") - col("__eq_c")).as("__eq_lo"),
        (col("__eq_off") + col("__eq_loc")).as("__eq_hi"))
    // bounded targets: pos/floor/ceil exactly as Percentile.getPercentile
    val targets = offs.groupBy().agg(max("__eq_n").as("__eq_n"))
      .select(posexplode(typedlit(fracs)).as(Seq("__eq_k", "__eq_p")),
        col("__eq_n"))
      .withColumn("__eq_pos",
        (col("__eq_n") - 1L).cast("double") * col("__eq_p"))
      .withColumn("__eq_l", floor(col("__eq_pos")))
      .withColumn("__eq_h", ceil(col("__eq_pos")))
    val coversL = col("__eq_l") >= col("__eq_lo") && col("__eq_l") < col("__eq_hi")
    val coversH = col("__eq_h") >= col("__eq_lo") && col("__eq_h") < col("__eq_hi")
    val br = spans.join(broadcast(targets), coversL || coversH)
      .groupBy("__eq_k", "__eq_pos", "__eq_l", "__eq_h")
      .agg(max(when(coversL, col("__eq_v"))).as("__eq_vl"),
        max(when(coversH, col("__eq_v"))).as("__eq_vh"))
    // getPercentile's branch structure and IEEE op order, exactly
    val edge = when(col("__eq_h") === col("__eq_l"), col("__eq_vl"))
      .when(col("__eq_vh") === col("__eq_vl"), col("__eq_vl"))
      .otherwise(
        (col("__eq_h").cast("double") - col("__eq_pos")) * col("__eq_vl") +
        (col("__eq_pos") - col("__eq_l").cast("double")) * col("__eq_vh"))
    // materialize the 1-row edge frame, then release the ranked
    // distinct-value cache (r21 lifecycle rule — CacheDiscipline): the
    // ranked table is data-sized (every distinct value), exactly the
    // class of cache that must not outlive its operator. Callers that
    // keep the returned frame may unpersist it when done (ksDriftBinned
    // does).
    CacheDiscipline.materialized(
      br.select(col("__eq_k"), edge.as("__eq_e"))
        .groupBy()
        .agg(array_sort(collect_list(struct(col("__eq_k"), col("__eq_e"))))
          .as("__eq_s"))
        .select(transform(col("__eq_s"), s => s.getField("__eq_e")).as(out)),
      ranked)
  }
}
