package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("grid spans min..max inclusive at the given step") {
    val df = Seq(ts("2024-01-01 03:15:00"), ts("2024-01-01 07:59:00"))
      .toDF("t")
    val g = TimeSeries.grid(df, date_trunc("hour", col("t")), "1 HOUR", "h")
      .as[Timestamp].collect()
    assert(g.length == 5, s"03..07 inclusive = 5 hours, got ${g.toSeq}")
    assert(g.head == ts("2024-01-01 03:00:00") && g.last == ts("2024-01-01 07:00:00"))
  }

  test("gapFill zero-fills absent buckets and keeps present ones") {
    val data = Seq((ts("2024-01-01 03:00:00"), 2L), (ts("2024-01-01 06:00:00"), 5L))
      .toDF("h", "n")
    val grid = TimeSeries.grid(
      Seq(ts("2024-01-01 03:30:00"), ts("2024-01-01 06:30:00")).toDF("t"),
      date_trunc("hour", col("t")), "1 HOUR", "h")
    val got = TimeSeries.gapFill(grid, data, "h", Map("n" -> lit(0L)))
      .orderBy("h").as[(Timestamp, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(2L, 0L, 0L, 5L))
  }

  test("grid over an empty source is empty (sequence of NULL bounds explodes to nothing)") {
    val empty = Seq.empty[Timestamp].toDF("t")
    assert(TimeSeries.grid(empty, date_trunc("hour", col("t")), "1 HOUR").count() == 0)
  }

  test("grid rejects malformed step strings at the call site (injection/typo guard)") {
    val df = Seq(ts("2024-01-01 03:15:00")).toDF("t")
    Seq("1 FORTNIGHT", "1' HOUR", "HOUR", "1HOUR; DROP").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        TimeSeries.grid(df, col("t"), bad)
      }
      assert(e.getMessage.contains(bad))
    }
    // the whitelist still admits the documented unit spellings
    assert(TimeSeries.grid(df, col("t"), "30 MINUTES").count() == 1)
  }

  test("gapFill rejects fill keys that are not data columns (typo guard)") {
    val data = Seq((ts("2024-01-01 03:00:00"), 2L)).toDF("h", "n")
    val grid = Seq(ts("2024-01-01 03:00:00")).toDF("h")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.gapFill(grid, data, "h", Map("m" -> lit(0L))) // "m" is a typo for "n"
    }
    assert(e.getMessage.contains("m"))
  }

  test("forwardFill carries the last non-null forward, null until first value") {
    val df = Seq(
      (1L, 1, None: Option[Double]), (1L, 2, Some(7.0)), (1L, 3, None),
      (1L, 4, None), (1L, 5, Some(9.0)), (2L, 1, None)
    ).toDF("k", "seq", "v")
    val w = Window.partitionBy("k").orderBy("seq")
    val got = df.select(col("k"), col("seq"), TimeSeries.forwardFill(col("v"), w).as("ff"))
      .orderBy("k", "seq").as[(Long, Int, Option[Double])].collect().toSeq
    assert(got.map(_._3) == Seq(None, Some(7.0), Some(7.0), Some(7.0), Some(9.0), None))
  }

  test("interpolateLinear: time-weighted interior lerp, edge fills, all-null partition") {
    // key 1: obs at t=0 (10.0) and t=20 (30.0); gaps at t=5 and t=10
    //   lerp: 10 + 20*(5/20) = 15.0 and 10 + 20*(10/20) = 20.0
    // key 2: leading gap backfills from the first obs, trailing gap
    //   carries the last obs forward
    // key 3: all-null stays null
    val df = Seq(
      (1L, 0L, Some(10.0)), (1L, 5L, None), (1L, 10L, None), (1L, 20L, Some(30.0)),
      (2L, 0L, None), (2L, 10L, Some(4.0)), (2L, 20L, None),
      (3L, 0L, None), (3L, 10L, None)
    ).toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t")
    val got = df
      .select(col("k"), col("t"),
        TimeSeries.interpolateLinear(col("v"), col("t"), w).as("vi"))
      .orderBy("k", "t").as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 0L, Some(10.0)), (1L, 5L, Some(15.0)), (1L, 10L, Some(20.0)), (1L, 20L, Some(30.0)),
      (2L, 0L, Some(4.0)), (2L, 10L, Some(4.0)), (2L, 20L, Some(4.0)),
      (3L, 0L, None), (3L, 10L, None)), s"got $got")
  }

  test("interpolateLinear: equal-timestamp neighbors fall back to the previous value") {
    // the null row shares t=5 with both observations: zero-length span,
    // guarded to pv (never a division by zero / ±Inf)
    val df = Seq((1L, 5L, 1, Some(2.0)), (1L, 5L, 2, None), (1L, 5L, 3, Some(8.0)))
      .toDF("k", "t", "seq", "v")
    val w = Window.partitionBy("k").orderBy("t", "seq")
    val got = df
      .select(col("seq"), TimeSeries.interpolateLinear(col("v"), col("t"), w).as("vi"))
      .orderBy("seq").as[(Int, Option[Double])].collect().toSeq
    assert(got == Seq((1, Some(2.0)), (2, Some(2.0)), (3, Some(8.0))), s"got $got")
  }

  test("cusum: closed form ≡ the textbook recursion; reset, boundary, tie-break") {
    // hand series (target 10, slack 2 → shift 12): values chosen to rise,
    // reset to 0, and rise again past h = 5
    val xs = Seq(15.0, 14.0, 1.0, 1.0, 16.0, 17.0)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "t", "x")
    val got = TimeSeries.cusum(df, col("k"), Seq(col("t")), col("x"),
        target = 10.0, slack = 2.0, h = 5.0)
      .orderBy("t").select("s", "alarm").as[(Double, Boolean)].collect().toSeq
    // the recursion, computed the sequential way the closed form replaces
    val exp = xs.scanLeft(0.0)((s, x) => math.max(0.0, s + x - 12.0)).tail
    got.map(_._1).zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"closed form $g != recursion $e") }
    // s: 3, 5, 0, 0, 4, 9 → only the last crosses h = 5; s == h exactly
    // (index 1) must NOT alarm (strict >)
    assert(exp(1) == 5.0 && !got(1)._2, "s exactly at h must not alarm")
    assert(got.map(_._2) == Seq(false, false, false, false, false, true))
    // duplicate timestamps: the ord tie-break pins the fold order —
    // (20 then 0) alarms mid-pair, (0 then 20) only at the end
    val dup = Seq((1L, 0L, 1L, 20.0), (1L, 0L, 2L, 0.0))
      .toDF("k", "t", "id", "x")
    val s1 = TimeSeries.cusum(dup, col("k"), Seq(col("t"), col("id")), col("x"),
        target = 0.0, slack = 0.0, h = 10.0)
      .orderBy("t", "id").select("alarm").as[Boolean].collect().toSeq
    assert(s1 == Seq(true, true), s"20-first order alarms both rows: $s1")
    val s2 = TimeSeries.cusum(dup, col("k"), Seq(col("t"), col("id").desc), col("x"),
        target = 0.0, slack = 0.0, h = 10.0)
      .orderBy(col("t"), col("id").desc).select("alarm").as[Boolean].collect().toSeq
    assert(s2 == Seq(false, true), s"0-first order alarms only the second: $s2")
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(dup, col("k"), Seq(col("t")), col("x"), 0.0, 0.0, h = 0.0)
    }
  }

  test("ksDriftByGroup: hand-computed D on a two-group fixture; zero on identical groups") {
    // g1 = {1,2,3,4}, g2 = {3,4,5,6}: the CDFs separate maximally at
    // v=2 (F1=0.5, F2=0) and stay 0.5 apart through v=4 → D = 0.5 for
    // both directions; ks = 0.5·sqrt(4·4/8) = 0.5·sqrt(2)
    val two = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
      ("b", 3), ("b", 4), ("b", 5), ("b", 6)).toDF("g", "v")
    val got = TimeSeries.ksDriftByGroup(two, col("g"), col("v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == 2)
    got.foreach { case (g, n, nRest, d, ks) =>
      assert(n == 4L && nRest == 4L, s"$g sizes")
      assert(math.abs(d - 0.5) < 1e-12, s"$g: D = $d, want 0.5")
      assert(math.abs(ks - 0.5 * math.sqrt(2.0)) < 1e-12, s"$g: ks = $ks")
    }
    // identical distributions → D = 0 exactly (rational counts, no fuzz)
    val same = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("g", "v")
    val zs = TimeSeries.ksDriftByGroup(same, col("g"), col("v"))
      .select("d").as[Double].collect()
    assert(zs.forall(_ == 0.0), s"identical groups must score 0: ${zs.toSeq}")
    // null values are excluded, not scored
    val withNull = Seq(("a", Some(1)), ("a", None), ("b", Some(1)))
      .toDF("g", "v")
    val n = TimeSeries.ksDriftByGroup(withNull, col("g"), col("v"))
      .filter(col("g") === "a").select("n").as[Long].head()
    assert(n == 1L, "the NULL row must not count toward a's sample size")
    // a lone group (after NULL exclusion) fails loudly at the API
    // boundary, never as an ANSI DIVIDE_BY_ZERO mid-plan
    val lone = Seq(("a", Some(1)), ("a", Some(2)), ("b", None)).toDF("g", "v")
    intercept[IllegalArgumentException](
      TimeSeries.ksDriftByGroup(lone, col("g"), col("v")))
  }

  test("ksDriftBinned: converges to the exact D with fine bins; vocabulary guard trips the exact form") {
    // two overlapping uniform-ish groups: with bins ≥ the value count,
    // every distinct value gets its own bin boundary region, so the
    // binned sup must equal the exact sup; with coarse bins it is a
    // lower bound
    val rows = (1 to 64).map(i => ("a", i.toDouble)) ++
      (1 to 64).map(i => ("b", i + 16.0))
    val df = rows.toDF("g", "v")
    val exact = TimeSeries.ksDriftByGroup(df, col("g"), col("v"))
      .select("g", "d").as[(String, Double)].collect().toMap
    val fine = TimeSeries.ksDriftBinned(df, col("g"), col("v"), bins = 128)
      .select("g", "d").as[(String, Double)].collect().toMap
    exact.foreach { case (g, d) =>
      assert(math.abs(fine(g) - d) < 1e-12,
        s"$g: fine-binned D ${fine(g)} != exact $d") }
    val coarse = TimeSeries.ksDriftBinned(df, col("g"), col("v"), bins = 4)
      .select("g", "d").as[(String, Double)].collect().toMap
    coarse.foreach { case (g, d) =>
      assert(d <= exact(g) + 1e-12 && d > 0.0,
        s"$g: coarse D $d must lower-bound exact ${exact(g)}") }
    // ks scaling shares the exact form's formula
    val row = TimeSeries.ksDriftBinned(df, col("g"), col("v"), bins = 128)
      .filter(col("g") === "a")
      .select("n", "n_rest", "d", "ks").as[(Long, Long, Double, Double)].head()
    assert(row._1 == 64L && row._2 == 64L)
    assert(math.abs(row._4 - row._3 * math.sqrt(64.0 * 64 / 128)) < 1e-12)
    // the sketch-edge scale path: approx_percentile is EXACT below its
    // accuracy bound, so on the fixture the approx form must reproduce
    // the exact-edge D bit-for-bit (at corpus scale the edges shift
    // within the sketch quantum; here the pin is the plumbing)
    val approx = TimeSeries.ksDriftBinned(df, col("g"), col("v"),
        bins = 128, approxEdges = true)
      .select("g", "d").as[(String, Double)].collect().toMap
    fine.foreach { case (g, d) =>
      assert(math.abs(approx(g) - d) < 1e-12, s"$g: approx ${approx(g)} vs $d") }
    // the exact form REFUSES a vocabulary past maxValues, naming the sibling
    val ex = intercept[IllegalArgumentException](
      TimeSeries.ksDriftByGroup(df, col("g"), col("v"), maxValues = 50))
    assert(ex.getMessage.contains("ksDriftBinned"), ex.getMessage)
    // a lone group fails loudly in the binned form too — IN-PLAN (the
    // guard rides the single bounded-totals broadcast, so construction
    // stays lazy and job-free; it fires at execution)
    val lone = intercept[Exception](
      TimeSeries.ksDriftBinned(df.filter(col("g") === "a"), col("g"), col("v"),
        bins = 8).collect())
    val msgs = Iterator.iterate[Throwable](lone)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(msgs.contains("at least 2 distinct groups"), msgs.take(300))
    // PARTIAL consumption must be loud too (review r19): first()/limit
    // may never evaluate a separate guard branch, so the in-row guard on
    // the body's `n` column has to raise on the first row touched —
    // never hand back the NaN row the 0/0 division would produce
    val loneFirst = intercept[Exception](
      TimeSeries.ksDriftBinned(df.filter(col("g") === "a"), col("g"), col("v"),
        bins = 8).first())
    val fm = Iterator.iterate[Throwable](loneFirst)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(fm.contains("at least 2 distinct groups"), fm.take(300))
    // ZERO groups (empty / all-NULL input) must be loud too — the r18
    // form silently returned an empty frame here because its guard rode
    // on perGroup rows that never exist (ADVICE r19); the exact sibling
    // probes and fails, and the binned form must match it
    for (degenerate <- Seq(
        df.filter(col("v") < -1e18),                             // empty
        Seq(("a", Option.empty[Double]), ("b", Option.empty[Double]))
          .toDF("g", "v"))) {                                    // all-NULL
      val zero = intercept[Exception](
        TimeSeries.ksDriftBinned(degenerate, col("g"), col("v"),
          bins = 8).collect())
      val zm = Iterator.iterate[Throwable](zero)(_.getCause)
        .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
      assert(zm.contains("at least 2 distinct groups") ||
        zm.contains("percentile"), zm.take(300))
    }
  }

  test("ksBinnedVsReference: zero on the reference itself, large on a shift, loud artifact validation") {
    val ref = (1 to 64).map(_.toDouble).toDF("v")
    val (edges, counts) = TimeSeries.psiReference(ref, col("v"), bins = 8)
    assert(edges.length == 7 && counts.sum == 64L && counts.forall(_ == 8L),
      s"equal-population artifact expected: $counts")
    // the reference slice against its own artifact: CDFs identical at
    // every edge → D exactly 0 (rationals of equal counts, no fuzz)
    val same = TimeSeries.ksBinnedVsReference(ref, col("v"), edges, counts)
      .select("n_cur", "n_ref", "d", "ks")
      .as[(Long, Long, Double, Double)].head()
    assert(same == ((64L, 64L, 0.0, 0.0)), s"self-KS must be zero: $same")
    // a half-range shift: at the median edge F_ref = 0.5, F_cur = 0 →
    // the sup is at least 0.5 minus in-bin resolution
    val shifted = (33 to 96).map(_.toDouble).toDF("v")
    val drift = TimeSeries.ksBinnedVsReference(shifted, col("v"), edges, counts)
      .select("n_cur", "d", "ks").as[(Long, Double, Double)].head()
    assert(drift._1 == 64L && drift._2 >= 0.45, s"shift must be visible: $drift")
    assert(math.abs(drift._3 - drift._2 * math.sqrt(64.0 * 64 / 128)) < 1e-12)
    // artifact validation is loud
    intercept[IllegalArgumentException](
      TimeSeries.ksBinnedVsReference(ref, col("v"), edges.tail, counts))
    intercept[IllegalArgumentException](
      TimeSeries.ksBinnedVsReference(ref, col("v"), Seq(0.5), Seq(0L, 0L)))
    // an EMPTY/all-NULL current slice must fail loudly, mirroring
    // psiDrift's vanished-population pin — the global sum counters are
    // NULL over zero rows, so a bare `n === 0` guard never fired and
    // the operator emitted a d=0 "no drift" row for a vanished
    // population (ADVICE r19, the exact masquerade the guard exists for)
    for (empty <- Seq(ref.filter(col("v") < -1e18),
        Seq(Option.empty[Double]).toDF("v"))) {
      val e = intercept[Exception](
        TimeSeries.ksBinnedVsReference(empty, col("v"), edges, counts).collect())
      val em = Iterator.iterate[Throwable](e)(_.getCause)
        .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
      assert(em.contains("vanished population"), em.take(300))
    }
  }

  test("psiDrift: zero on identical slices, large on a shift, mass conserved, bins smoothed") {
    val ref = (1 to 200).map(i => i % 100).toDF("v")
    // identical populations → every bin's fractions equal → PSI exactly 0
    val same = TimeSeries.psiDrift(ref, ref, col("v"), bins = 10)
      .select("term").as[Double].collect()
    assert(same.length == 10 && same.forall(_ == 0.0), s"identical: ${same.toSeq}")
    // a shifted current slice concentrates in the top bins → PSI blows
    // past the industry 0.25 'investigate' line
    val shifted = (1 to 200).map(i => i % 100 + 90).toDF("v")
    val drift = TimeSeries.psiDrift(ref, shifted, col("v"), bins = 10)
    val rows = drift.select("bin", "n_ref", "n_cur", "term")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0L until 10L).toSeq, "one row per bin, empty included")
    assert(rows.map(_._2).sum == 200L && rows.map(_._3).sum == 200L, "mass conserved")
    assert(rows.map(_._4).sum > 0.25, s"shift must alarm: PSI = ${rows.map(_._4).sum}")
    // add-one smoothing keeps empty bins finite (no NaN/Inf terms)
    assert(rows.forall(r => !r._4.isNaN && !r._4.isInfinite), s"terms: ${rows.toSeq}")
    intercept[IllegalArgumentException](TimeSeries.psiDrift(ref, ref, col("v"), bins = 1))
  }

  test("binOfSortedCol: binary search == linear fold on random sorted edges (ties, edge-equal, NaN)") {
    // r21 — the O(log bins) binning must return bit-identical longs to
    // the O(bins) fold it replaced, for every edge count the operator
    // can see (including 31 = the gated q185 and 999 = the documented
    // default), duplicate edges, values AT edges, and NaN (Spark orders
    // NaN greatest, so both forms count every edge)
    val rnd = new scala.util.Random(42)
    for (m <- Seq(1, 2, 3, 7, 31, 64, 999)) {
      val edges = Seq.fill(m)(math.floor(rnd.nextDouble() * 20) / 4.0).sorted
      val vals = (edges ++ Seq(-1.0, 0.0, 5.01, Double.NaN) ++
        Seq.fill(50)(rnd.nextDouble() * 6 - 0.5)).toDF("v")
      val linear = aggregate(typedlit(edges), lit(0L),
        (acc, e) => acc + when(col("v").cast("double") > e, 1L).otherwise(0L))
      val both = vals.select(
        linear.as("lin"),
        TimeSeries.binOfSortedCol(col("v"), typedlit(edges), m).as("bin"))
        .as[(Long, Long)].collect()
      both.foreach { case (lin, bin) =>
        assert(lin == bin, s"m=$m: linear $lin vs binary $bin") }
    }
  }
}
