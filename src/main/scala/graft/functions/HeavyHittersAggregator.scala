package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * MERGEABLE, k-BOUNDED path to "most frequent tokens" that the exact
  * form (q26: explode → count → top-n) cannot provide on an OPEN
  * vocabulary: exact counting shuffles one row per DISTINCT token, which
  * for URLs, hostnames or code identifiers at 100 TB is itself a
  * multi-TB shuffle. This sketch's partial state is capped at `cap`
  * counters per partition regardless of vocabulary size, so the shuffle
  * is `partitions × cap` rows — constant in the data, like the HLL /
  * KMV family in [[graft.operators.ApproxOps]] (same semilattice
  * discipline: `merge` is associative+commutative, so map-side partial
  * aggregation and day-over-day state union both just work).
  *
  * Both `reduce` and `merge` are combine-then-trim (the mergeable-
  * summaries formulation of Misra–Gries, Agarwal et al., PODS 2012):
  * union the counters; if more than `cap` survive, subtract the
  * (cap+1)-th largest count from ALL and drop the non-positive. Each
  * subtraction of `x` removes at least `x·(cap+1)` total mass, so
  * across an input of N tokens the total subtracted from any single
  * key is at most N/(cap+1) — giving the classic guarantee:
  *
  *   true(t) − N/(cap+1)  ≤  est(t)  ≤  true(t)
  *
  * so every token with true frequency above N/(cap+1) is present, and
  * with `cap` ≥ the number of distinct tokens no trim ever fires and
  * the counts are EXACT (how q124 stays oracle-gateable on the
  * closed-vocabulary fixture). Under-threshold membership MAY depend on
  * partitioning — only the guarantee is deterministic, which is why the
  * gated query sizes `cap` for exactness and the spec asserts the bound
  * at small `cap` instead of equality.
  *
  * The trim sorts the counter values only when the map overflows
  * (never, once the survivors stabilize to the true heavy hitters); a
  * production tightening for adversarial churn is a min-heap over
  * counts, but the O(cap log cap) worst case per overflow is already
  * amortized by the ≥cap tokens that must arrive to cause one.
  */
class HeavyHittersAggregator(cap: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(cap > 0, s"heavy-hitters needs cap > 0, got $cap")

  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= cap) m
    else {
      val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(cap)
      m.iterator
        .filter { case (_, c) => c > cut }
        .map { case (t, c) => t -> (c - cut) }
        .toMap
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    trim(buf.updated(tok, buf.getOrElse(tok, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    trim(small.foldLeft(large) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    })
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
