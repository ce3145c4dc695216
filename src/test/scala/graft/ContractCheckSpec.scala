package graft
class ContractCheckSpec extends SparkSpec {
  test("driver contract: queries and oracleSql align, entry returns rows") {
    // every gated query MUST carry an oracle — a missing entry silently
    // downgrades the driver's check to rows-only; a stray oracle key
    // would run against nothing. 188 as of round 18; grow-only (a stale
    // floor would let a 50-query registry regression pass — ADVICE r16).
    assert(SparkEntry.queries.size >= 188, s"queries: ${SparkEntry.queries.size}")
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      s"mismatch: ${SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet} / ${SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet}")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
