package graft

import org.apache.spark.sql.functions._

/** Regression tests for cross-engine divergences that the null-free,
  * half-way-free fixtures cannot trigger (ROUND_NOTES round-1 deferrals).
  * Each test exercises the robust form the queries now use AND documents
  * the naive form's failure so the divergence stays visible. */
class CrossEngineRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("pair-distinct via struct counts null-containing tuples like the oracle's DISTINCT subquery") {
    val df = Seq[(Option[Int], Option[Int])](
      (Some(1), Some(1)), (Some(1), Some(1)), (Some(1), None),
      (None, Some(2)), (None, None))
      .toDF("a", "b")
    // oracle semantics: SELECT count(*) FROM (SELECT DISTINCT a, b ...) = 4
    val robust = df.agg(countDistinct(struct(col("a"), col("b")))).as[Long].head()
    assert(robust == 4L)
    // naive multi-arg countDistinct drops every tuple containing a null
    val naive = df.agg(countDistinct(col("a"), col("b"))).as[Long].head()
    assert(naive == 1L, "documents the divergence the struct form fixes")
  }

  test("packSequences running sum is ROWS, not RANGE, under tied order keys") {
    // Four docs tied on the order key, equal token counts — the one tie
    // shape whose ROWS result is permutation-invariant, so it is exactly
    // expressible as an assertion. ROWS (the oracle's spelling): offsets
    // 0,200,400,600 → three docs in seq 0, one in seq 1. The default
    // RANGE frame hands every tied row the whole peer group's sum (off =
    // 800−200 = 600 for all four) → all four docs land in seq 1. Round
    // 7's q84 driver hash-fail made this implicit-frame hazard concrete;
    // the frame is now pinned in TextAnalysis.packSequences.
    val docs = Seq(
      ("A", 1L, 200L), ("A", 1L, 200L), ("A", 1L, 200L), ("A", 1L, 200L)
    ).toDF("src", "ord", "tok")
    val got = graft.operators.TextAnalysis.packSequences(
        docs, col("src"), col("ord"), col("tok"), seqLen = 512L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("A", 0L, 3L, 600L), ("A", 1L, 1L, 200L)),
      s"RANGE frame would collapse everything into seq 1; got $got")
  }

  test("per-key JSON coercion survives a non-integer value under another key") {
    val df = Seq(
      """{"k": 7, "j": "not-an-int"}""",
      """{"k": 2}""",
      """{"j": 5}""",
      """not json at all""").toDF("props")
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
    val got = df
      .select(try_element_at(m, lit("k")).as("kraw"))
      .agg(sum(expr("try_cast(kraw AS INT)")).as("ks"), count(col("kraw")).as("nk"))
      .as[(Long, Long)].head()
    assert(got == ((9L, 2L)), "k must survive the bad value under j (json_extract semantics)")
    // naive typed-map parse nulls the whole document's map instead
    val typed = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
    val naive = df.select(try_element_at(typed, lit("k")).as("kv"))
      .agg(sum(col("kv")).as("ks")).as[Long].head()
    assert(naive == 2L, "documents the whole-map-nulling the string-map form fixes")
  }
}
