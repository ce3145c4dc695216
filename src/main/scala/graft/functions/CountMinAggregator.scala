package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** COUNT-MIN sketch (Cormode & Muthukrishnan 2005) as a typed
  * `Aggregator` — the POINT-QUERY member of the sketch family
  * ([[HeavyHittersAggregator]] answers "which tokens are frequent",
  * HLL/KMV in [[graft.operators.ApproxOps]] answer "how many distinct";
  * this answers "how often does token t occur" for ANY t, without
  * storing the vocabulary): a `depth × width` counter matrix, each
  * incoming token incrementing one cell per row at
  * `hash_i(token) mod width`; the estimate for t is the MINIMUM of its
  * `depth` cells.
  *
  * Guarantees (one-sided): `est(t) ≥ true(t)` ALWAYS — cells only ever
  * add — and `est(t) ≤ true(t) + ε·N` with probability `1 − δ` for
  * `width = ⌈e/ε⌉`, `depth = ⌈ln 1/δ⌉` (N = total tokens). At
  * `width ≫ |vocab|` collisions vanish and estimates are EXACT — the
  * q124/q111 discipline that keeps the gated query hash-comparable
  * against plain exact counting.
  *
  * Scale shape: the partial state is a FIXED `depth·width` long array —
  * independent of vocabulary AND of data volume — so the shuffle is
  * `partitions × groups × depth·width·8 B`, constant in the corpus.
  * `merge` is elementwise addition: associative, commutative, and —
  * unlike Misra–Gries, whose under-threshold survivors may depend on
  * partitioning — fully DETERMINISTIC: the final matrix is identical
  * under any partitioning or merge order (spec-pinned), and
  * day-over-day union is the same elementwise add on persisted sketch
  * rows ([[graft.operators.ApproxOps.cmsMerge]]).
  *
  * Hashing: `MurmurHash3.stringHash(token, seed = row)` — a pure
  * function of (token, row), engine-independent and stable across JVMs,
  * so a sketch written to parquet today probes identically tomorrow. */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 2,
    s"count-min needs depth >= 1 and width >= 2, got ($depth, $width)")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinAggregator.cell(tok, d, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinAggregator {
  /** The cell a token hits in row `d` — shared by update (executor) and
    * probe-index derivation (driver, for literal probe lists). */
  def cell(token: String, d: Int, width: Int): Int =
    Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(token, d), width)
}
