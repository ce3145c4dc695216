package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Second-moment accumulator for the covariance matrix of an embedding
  * column — the one-pass distributed form of `X'X`: the partial state is
  * a FIXED-size double array `[n, Σx_0 … Σx_{dim−1}, Σx_i·x_j (i ≤ j)]`
  * (1 + dim + dim·(dim+1)/2 cells — 16.9 KB at dim = 64), so the shuffle
  * is `partitions × state` and constant in the corpus, exactly the
  * [[CountMinAggregator]] sketch discipline. `merge` is elementwise
  * addition (associative + commutative); the only cross-run freedom is
  * float-Σ association, which the consuming gates absorb by rounding
  * (the q142 centroid-mean argument — relative error ~1e-12 over 1e4
  * rows of O(1) components, far below the 1e-6 grid).
  *
  * The state is raw SUMS, not centered moments: centering happens once
  * at finish time (population covariance `Σxy/n − μx·μy`), so merge
  * needs no Welford-style pairwise correction and stays exact in
  * structure. Upper triangle only — covariance is symmetric; consumers
  * mirror. Vectors shorter than `dim` raise; NULL vectors are the
  * caller's to filter (a NULL element would poison sums silently).
  *
  * Scale bound (documented, like sqStats' wide-aggregate bound): state
  * is O(dim²) — fine through dim ~1k (4 MB partials); past that, the
  * covariance itself is the wrong object to materialize and sketched /
  * randomized-projection methods take over. */
class CovarianceAggregator(dim: Int)
    extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
  require(dim >= 1, s"covariance needs dim >= 1, got $dim")
  private val tri = dim * (dim + 1) / 2

  override def zero: Array[Double] = new Array[Double](1 + dim + tri)

  override def reduce(buf: Array[Double], v: Seq[Double]): Array[Double] = {
    require(v != null && v.length >= dim,
      s"vector of length ${if (v == null) -1 else v.length} < dim $dim")
    val x = v.toArray
    buf(0) += 1.0
    var i = 0
    var t = 1 + dim
    while (i < dim) {
      buf(1 + i) += x(i)
      var j = i
      while (j < dim) { buf(t) += x(i) * x(j); j += 1; t += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object CovarianceAggregator {
  /** Index of Σx_i·x_j (i ≤ j) inside the state array. */
  def triIndex(i: Int, j: Int, dim: Int): Int = {
    require(i <= j && j < dim, s"need i <= j < dim, got ($i, $j, $dim)")
    1 + dim + i * dim - i * (i - 1) / 2 + (j - i)
  }
}

/** ORDER-EXACT sibling of [[CovarianceAggregator]] over GRID-SNAPPED
  * integer components (the q170 gate's engine,
  * [[graft.operators.Pca.covarianceMatrixExact]]): same fixed-size state
  * layout `[n, Σx, Σxy(i ≤ j)]` but as EXACT longs — long addition
  * commutes, so the moments are bit-identical under any partitioning or
  * merge order, which is the whole point of the exact form. Input rows
  * are the already-snapped integer components (`round(x·scale)` as
  * long, done in the plan so the snap is the portable expression both
  * engines share). ONE aggregator expression regardless of dim — the
  * first draft unrolled 1 + dim + dim·(dim+1)/2 separate `sum()`
  * columns, which planned fine at dim 16 (153 aggregates) but is the
  * q158 plan-size failure class at dim 64 (2 145 aggregates). Overflow
  * throws loudly via `Math.addExact`/`multiplyHigh`-free exact ops (the
  * ANSI-mode contract of the column form). */
class CovarianceLongAggregator(dim: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(dim >= 1, s"covariance needs dim >= 1, got $dim")
  private val tri = dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](1 + dim + tri)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    require(v != null && v.length >= dim,
      s"vector of length ${if (v == null) -1 else v.length} < dim $dim")
    val x = v.toArray
    buf(0) += 1L
    var i = 0
    var t = 1 + dim
    while (i < dim) {
      buf(1 + i) = Math.addExact(buf(1 + i), x(i))
      var j = i
      while (j < dim) {
        buf(t) = Math.addExact(buf(t), Math.multiplyExact(x(i), x(j)))
        j += 1; t += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
