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
