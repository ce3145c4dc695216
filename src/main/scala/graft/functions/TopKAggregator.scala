package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate — the scale path for per-group top-k that
  * SURVEY.md §2.10/§7 names: a `rank()/row_number()` window must SORT every
  * group's candidates (and at 100 TB the similarity-search candidate list
  * per query can be millions of rows); this aggregator keeps only k
  * elements per group in a bounded buffer, merges associatively
  * (partial aggregation works map-side), and never sorts more than
  * `2k` elements at once.
  *
  * Input: (score, id); output: the k (score DESC, id ASC) pairs — the same
  * ordering contract as Q25's `row_number() OVER (ORDER BY sim DESC,
  * vec_id)` window, so results are interchangeable (asserted in
  * TopKAggregatorSpec).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[TopKAggregator.Scored]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) trim(buf :+ in)
    else if (ord.lt(in, buf.last)) trim(buf.init :+ in)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[TopKAggregator.Scored] =
    buf.map { case (s, id) => TopKAggregator.Scored(s, id) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[TopKAggregator.Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKAggregator.Scored]]()
}

object TopKAggregator {
  /** Named output fields — `array<struct<score,id>>` at the SQL surface
    * instead of leaked tuple `_1/_2` names. */
  case class Scored(score: Double, id: Long)
}
