package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Discretize

/** [[Discretize.ntileRangeRank]] — the range-rank form must equal the
  * contract `ntile` window everywhere; its existence is justified by the
  * plan shape (PlanShapeSpec: parallel range sort, no single-partition
  * sort of the data), not by these fixtures. */
class DiscretizeSpec extends SparkSpec {
  import spark.implicits._

  private def ntileWindow(df: org.apache.spark.sql.DataFrame, b: Int) =
    df.select(col("event_id"),
      ntile(b).over(Window.orderBy(col("value"), col("event_id")))
        .cast("long").as("bucket"))

  test("range-rank form equals Q11's global ntile on the fixture events") {
    val src = sf0001.events.filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("value"))
    val want = ntileWindow(src, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Discretize.ntileRangeRank(src, 16, col("value"), col("event_id"))
      .select("event_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == want.size && got == want,
      s"forms diverged on ${got.toSet.diff(want.toSet).take(3)}")
    assert(want.valuesIterator.toSet.size == 16, "fixture must fill all buckets")
  }

  test("heavy ties: rows with equal values split across buckets exactly as ntile") {
    // 100 rows over only 3 distinct values, 7 buckets that don't divide
    // evenly — a value-threshold bucketing CANNOT reproduce this (whole
    // tie-groups would land together); the rank form must split ties by
    // the unique trailing order column precisely where the window does
    val src = spark.range(100).selectExpr("id AS event_id", "CAST(id % 3 AS double) AS value")
    val want = ntileWindow(src, 7).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Discretize.ntileRangeRank(src, 7, col("value"), col("event_id"))
      .select("event_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"tie split diverged: ${got.toSet.diff(want.toSet).take(5)}")
  }

  test("fewer rows than buckets: bucket = rank, high buckets stay empty") {
    val src = Seq((10L, 5.0), (11L, 1.0), (12L, 3.0)).toDF("event_id", "value")
    val got = Discretize.ntileRangeRank(src, 16, col("value"), col("event_id"))
      .select("event_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(11L -> 1L, 12L -> 2L, 10L -> 3L), s"$got")
  }

  test("property sweep: equals the window ntile for random (n, buckets, tie density)") {
    // fixed-seed sweep over the parameter cube the closed-form split
    // must cover: n below/at/above bucket-multiples, bucket counts that
    // do and don't divide n, and tie densities from all-distinct to
    // 90%-collapsed — every cell compared row-for-row against the
    // window form on the identical total order
    val rnd = new scala.util.Random(4146L)
    for (_ <- 1 to 12) {
      val n = 1 + rnd.nextInt(400)
      val b = 1 + rnd.nextInt(40)
      val distinct = 1 + rnd.nextInt(math.max(1, n))
      val src = spark.range(n.toLong)
        .selectExpr("id AS event_id", s"CAST(xxhash64(id) % $distinct AS double) AS value")
      val want = ntileWindow(src, b).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Discretize.ntileRangeRank(src, b, col("value"), col("event_id"))
        .select("event_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"n=$n b=$b distinct=$distinct diverged: ${got.toSet.diff(want.toSet).take(5)}")
      // the operator persists its range-partitioned view (its documented
      // caller-owns-cleanup contract) — don't accumulate 12 cache entries
      // in the suite-shared session
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("correct with exchange reuse disabled: the persisted view pins one partitioning") {
    // the operator's two branches (offsets aggregate + main join) both
    // consume the range-partitioned view; before the persist landed,
    // correctness relied on ReuseExchange deduplicating the two
    // physical exchanges — RangePartitioner samples boundaries with an
    // RDD-id-derived seed, so with reuse off the branches could see
    // DIFFERENT partitionings and the offsets would be wrong. The cache
    // must make this config-independent.
    val key = "spark.sql.exchange.reuse.enabled"
    val prev = spark.conf.get(key, "true")
    try {
      spark.conf.set(key, "false")
      val src = spark.range(500).selectExpr(
        "id AS event_id", "CAST(xxhash64(id) % 37 AS double) AS value")
      val want = ntileWindow(src, 11).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Discretize.ntileRangeRank(src, 11, col("value"), col("event_id"))
        .select("event_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"diverged with reuse off: ${got.toSet.diff(want.toSet).take(5)}")
    } finally {
      spark.conf.set(key, prev)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("single bucket and empty input degenerate correctly") {
    val src = Seq((1L, 2.0), (2L, 1.0)).toDF("event_id", "value")
    val one = Discretize.ntileRangeRank(src, 1, col("value"), col("event_id"))
      .select("bucket").as[Long].collect().toSeq
    assert(one == Seq(1L, 1L), s"$one")
    val empty = Discretize.ntileRangeRank(
      src.filter(lit(false)), 4, col("value"), col("event_id")).collect()
    assert(empty.isEmpty)
    intercept[IllegalArgumentException] {
      Discretize.ntileRangeRank(src, 0, col("value"))
    }
  }
}
