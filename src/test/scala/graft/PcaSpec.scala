package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Pins for the PCA family: q170 hash-gates the distributed covariance
  * pass against DuckDB; these pin the driver-side eigensolver and the
  * projection — the parts no SQL oracle can restate. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-9) =
    math.abs(a - b) < tol

  test("covarianceMatrix: closed form on a hand fixture; symmetric storage") {
    // x = (1,2,3,4), y = (1,3,5,7): population var(x) = 1.25,
    // var(y) = 5, cov(x,y) = 2.5, means 2.5 and 4
    val df = Seq(
      (1L, Seq(1.0, 1.0)), (2L, Seq(2.0, 3.0)),
      (3L, Seq(3.0, 5.0)), (4L, Seq(4.0, 7.0))).toDF("vec_id", "e")
    val rows = Pca.covarianceMatrix(df, dim = 2)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rows.size == 3, "upper triangle of a 2x2 has 3 entries")
    val (_, _, n, m0, _, v00) = rows((0L, 0L))
    assert(n == 4L && close(m0, 2.5) && close(v00, 1.25))
    assert(close(rows((1L, 1L))._6, 5.0) && close(rows((1L, 1L))._4, 4.0))
    assert(close(rows((0L, 1L))._6, 2.5))
  }

  test("jacobiEigen: 2x2 closed form") {
    // [[2,1],[1,2]] has eigenvalues 3 (along (1,1)/√2) and 1
    val (values, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = values.sorted
    assert(close(sorted(0), 1.0) && close(sorted(1), 3.0))
    val c3 = values.indexWhere(v => close(v, 3.0))
    val ev = Array(vecs(0)(c3), vecs(1)(c3))
    assert(close(math.abs(ev(0)), 1.0 / math.sqrt(2)) &&
      close(math.abs(ev(1)), 1.0 / math.sqrt(2)) && close(ev(0) / ev(1), 1.0))
  }

  test("pcaComponents: recovers a planted low-rank structure; orthonormal, ordered, " +
      "deterministic across partitionings") {
    // data = strong direction d1 + weak orthogonal d2, emitted in ALL
    // FOUR sign combinations per coefficient pair so the two
    // coefficients have exactly zero mean AND zero cross-correlation
    // (the first draft used b = a/10 with paired signs — perfectly
    // correlated coefficients make the data rank-1 along d1 + 0.1·d2,
    // and PCA correctly recovered THAT; the fixture was wrong)
    val d1 = Array(0.6, 0.8, 0.0, 0.0)
    val d2 = Array(0.0, 0.0, 1.0, 0.0)
    val pts = (1 to 25).flatMap { i =>
      val a = i * 0.1; val b = i * 0.01
      for (sa <- Seq(1.0, -1.0); sb <- Seq(1.0, -1.0)) yield
        d1.map(_ * a * sa).zip(d2.map(_ * b * sb))
          .map { case (p, q) => p + q }
    }.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val df = pts.toDF("vec_id", "e")
    val (mean, comps, eig) = Pca.pcaComponents(df, dim = 4, k = 3)
    mean.foreach(m => assert(close(m, 0.0)))
    // eigenvalues descending, third ~0 (rank-2 data)
    assert(eig(0) > eig(1) && eig(1) > 0 && close(eig(2), 0.0, 1e-9))
    // components recover the planted directions (up to canonical sign)
    def align(c: Array[Double], d: Array[Double]): Double =
      math.abs(c.zip(d).map { case (x, y) => x * y }.sum)
    assert(align(comps(0), d1) > 1 - 1e-9, s"pc1 ${comps(0).toSeq} != d1")
    assert(align(comps(1), d2) > 1 - 1e-9, s"pc2 ${comps(1).toSeq} != d2")
    // orthonormality
    for (a <- comps; b <- comps) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      assert(close(dot, if (a eq b) 1.0 else 0.0))
    }
    // projection variance along each component = its eigenvalue
    val proj = Pca.pcaProject(df, mean, comps)
      .select(posexplode(col("proj"))).as[(Int, Double)].collect()
    for (c <- 0 until 2) {
      val xs = proj.filter(_._1 == c).map(_._2)
      val v = xs.map(x => x * x).sum / xs.length - math.pow(xs.sum / xs.length, 2)
      assert(close(v, eig(c), 1e-9 + 1e-9 * eig(c)),
        s"projection variance $v along pc$c != eigenvalue ${eig(c)}")
    }
    // determinism: a different partitioning yields the same components
    // to float-sum tolerance
    val (m2, c2, e2) = Pca.pcaComponents(df.repartition(7), dim = 4, k = 3)
    mean.zip(m2).foreach { case (x, y) => assert(close(x, y)) }
    eig.zip(e2).foreach { case (x, y) => assert(close(x, y)) }
    // only the non-degenerate components: pc3 spans a multiplicity-2
    // zero eigenspace where any orthonormal basis is equally valid, so
    // a 1e-15 moment perturbation may rotate it freely
    comps.take(2).zip(c2.take(2)).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (x, y) => assert(close(x, y)) } }
    // argument validation
    intercept[IllegalArgumentException] { Pca.pcaComponents(df, dim = 4, k = 5) }
    // a NULL/short embedding must FAIL pcaProject naming the vector —
    // never silently pad through zip_with into NULL projections
    // (ADVICE r16: the aggregator path requires length >= dim; the
    // projection now mirrors it, and slices oversized rows the same way)
    val malformed = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("vec_id", "e")
    val errp = intercept[Exception] {
      Pca.pcaProject(malformed, mean, comps).collect()
    }
    val pmsgs = Iterator.iterate[Throwable](errp)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(pmsgs.contains("vec_id=0"), s"must name the short vector: $pmsgs")
    // an OVERSIZED vector projects via its first dim components (the
    // momentState slice contract), instead of NULLing out
    val over = Seq((9L, Seq(1.0, 0.0, 0.0, 0.0, 99.0))).toDF("vec_id", "e")
    val pOver = Pca.pcaProject(over, mean, comps)
      .select(col("proj")).as[Seq[Double]].head()
    assert(pOver.length == 3 && pOver.forall(v => !v.isNaN),
      s"oversized vector must slice-project cleanly: $pOver")
  }

  test("covarianceMatrixExact: closed form on an on-grid fixture; ≡ float form within snap tolerance") {
    // the float fixture's values are integers — on the 1e-6 grid the
    // snap is lossless, so the exact form must reproduce the closed
    // forms EXACTLY (not approximately)
    val df = Seq(
      (1L, Seq(1.0, 1.0)), (2L, Seq(2.0, 3.0)),
      (3L, Seq(3.0, 5.0)), (4L, Seq(4.0, 7.0))).toDF("vec_id", "e")
    val rows = Pca.covarianceMatrixExact(df, dim = 2)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rows.size == 3)
    assert(rows((0L, 0L))._3 == 4L && rows((0L, 0L))._4 == 2.5
      && rows((0L, 0L))._6 == 1.25)
    assert(rows((1L, 1L))._6 == 5.0 && rows((1L, 1L))._4 == 4.0)
    assert(rows((0L, 1L))._6 == 2.5)
    // on real (off-grid) embeddings the exact form tracks the float
    // form to the snap bound: |Δmean| ≤ 5e-7, |Δcov| ≲ 1e-6
    val e = sf0001.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val ex = Pca.covarianceMatrixExact(e, dim = 8)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val fl = Pca.covarianceMatrix(e, dim = 8)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(ex.keySet == fl.keySet && ex.nonEmpty)
    ex.foreach { case (k, (_, _, n, mi, mj, cv)) =>
      val (_, _, nf, mif, mjf, cvf) = fl(k)
      assert(n == nf)
      assert(math.abs(mi - mif) <= 6e-7, s"mean_i drift at $k: $mi vs $mif")
      assert(math.abs(mj - mjf) <= 6e-7, s"mean_j drift at $k: $mj vs $mjf")
      assert(math.abs(cv - cvf) <= 2e-6, s"cov drift at $k: $cv vs $cvf")
    }
  }

  test("covarianceMatrixExact at dim 64: the full 2145-moment aggregator state (the unrolled form's failure point)") {
    // the aggregator exists BECAUSE dim 64 needs 1 + 64 + 64·65/2 = 2145
    // moments — as unrolled sum() columns that is the q158 plan-size
    // failure class; as one long-state aggregator it must just work and
    // track the float form to the snap bound
    val e = sf0001.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val ex = Pca.covarianceMatrixExact(e, dim = 64)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(ex.size == 64 * 65 / 2, s"full upper triangle expected: ${ex.size}")
    val fl = Pca.covarianceMatrix(e, dim = 64)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    ex.foreach { case (k, (_, _, n, mi, mj, cv)) =>
      val (_, _, nf, mif, mjf, cvf) = fl(k)
      assert(n == nf && n > 0)
      assert(math.abs(mi - mif) <= 6e-7 && math.abs(mj - mjf) <= 6e-7, s"mean at $k")
      assert(math.abs(cv - cvf) <= 2e-6, s"cov at $k: $cv vs $cvf")
    }
  }

  test("q170 gate is order-exact: one identical canon md5 across partition counts and input shuffles") {
    // r17's driver-red row: the float gate's hash flipped with task
    // completion order. The rewritten gate must produce ONE canonical
    // md5 under any merge topology — vary the final-agg fan-in via
    // shuffle.partitions AND the partial grouping via explicit input
    // repartition/reorder seeds, and require bit-identical output.
    val ref = Canon.md5(ExtensionQueries.q170(sf0001))
    for (p <- Seq("1", "3", "13")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try assert(Canon.md5(ExtensionQueries.q170(sf0001)) == ref,
        s"q170 canon drifted at shuffle.partitions=$p")
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val e = sf0001.embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    def bits(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Seq[Long])] =
      d.orderBy("i", "j").as[(Long, Long, Long, Double, Double, Double)]
        .collect().toSeq.map(r => (r._1, r._2, r._3, Seq(
          java.lang.Double.doubleToLongBits(r._4),
          java.lang.Double.doubleToLongBits(r._5),
          java.lang.Double.doubleToLongBits(r._6))))
    val refBits = bits(Pca.covarianceMatrixExact(e, dim = 16))
    for (seed <- Seq(11, 42, 99)) {
      val shuffled = e.orderBy(md5(concat(col("vec_id").cast("string"),
        lit(seed.toString)))).repartition(seed % 7 + 2)
      assert(bits(Pca.covarianceMatrixExact(shuffled, dim = 16)) == refBits,
        s"exact covariance not bit-identical under input shuffle seed=$seed")
    }
  }

  test("mergeMoments: yesterday's state + today's batch ≡ full recompute (no corpus re-read)") {
    // 80 deterministic pseudo-random vectors split into "yesterday" and
    // "today's batch"; the merged states must agree with the full pass
    val pts = (0 until 80).map { i =>
      val r = new scala.util.Random(4242L + i)
      (i.toLong, Seq.fill(4)(r.nextGaussian()))
    }
    val df = pts.toDF("vec_id", "e")
    val full = Pca.momentStateOf(df, dim = 4)
    val yesterday = Pca.momentStateOf(df.filter(col("vec_id") < 50), dim = 4)
    val batch = Pca.momentStateOf(df.filter(col("vec_id") >= 50), dim = 4)
    val merged = Pca.mergeMoments(yesterday, batch)
    assert(merged(0) == full(0), "the count inside the state is exact")
    full.zip(merged).foreach { case (f, m) =>
      assert(math.abs(f - m) <= 1e-9 * math.max(1.0, math.abs(f)),
        s"merged moment $m != full $f beyond float-association tolerance") }
    // and the recentered components from the merged state match the
    // full-recompute components
    val (mMean, mComps, mEig) = Pca.pcaComponentsFromState(merged, dim = 4, k = 2)
    val (fMean, fComps, fEig) = Pca.pcaComponents(df, dim = 4, k = 2)
    mMean.zip(fMean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    mEig.zip(fEig).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    mComps.zip(fComps).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) } }
    intercept[IllegalArgumentException] {
      Pca.mergeMoments(merged, new Array[Double](3))
    }
  }
}
