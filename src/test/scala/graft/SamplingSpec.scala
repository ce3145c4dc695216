package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample is deterministic and partitioning-independent") {
    val df = sf0001.lineitem
    val key = concat_ws(":", col("l_orderkey"), col("l_linenumber"))
    val once = Sampling.hashSample(df, key, 0.25)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    // same rows regardless of physical layout — the property df.sample lacks
    val shuffled = Sampling.hashSample(df.repartition(17, col("l_partkey")), key, 0.25)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(once == shuffled, "hash sampling must not depend on partitioning")
    assert(once.nonEmpty)
  }

  test("sampled fraction is close to the requested fraction") {
    val df = sf0001.lineitem
    val total = df.count().toDouble
    val key = concat_ws(":", col("l_orderkey"), col("l_linenumber"))
    for (f <- Seq(0.1, 0.5, 0.9)) {
      val got = Sampling.hashSample(df, key, f).count() / total
      assert(math.abs(got - f) < 0.05, s"fraction $f sampled $got")
    }
    assert(Sampling.hashSample(df, key, 0.0).count() == 0)
    assert(Sampling.hashSample(df, key, 1.0).count() == total)
  }

  test("stratified sample applies per-stratum fractions and drops unlisted strata") {
    val df = sf0001.lineitem
    val key = concat_ws(":", col("l_orderkey"), col("l_linenumber"))
    val rates = Map("A" -> 0.8, "N" -> 0.1) // "R" intentionally absent
    val got = Sampling.stratifiedHashSample(df, key, col("l_returnflag"), rates)
      .groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    val totals = df.groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    assert(!got.contains("R"), "unlisted stratum must be dropped entirely")
    assert(math.abs(got("A").toDouble / totals("A") - 0.8) < 0.1)
    assert(math.abs(got("N").toDouble / totals("N") - 0.1) < 0.1)
  }

  test("null keys sample as one entity instead of silently vanishing") {
    val df = Seq((Some("k1"), 1), (None, 2), (None, 3), (Some("k2"), 4))
      .toDF("key", "v")
    // fraction 1.0 must keep EVERY row, null keys included — a naive
    // md5(null)=null bucket would drop them at any fraction
    assert(Sampling.hashSample(df, col("key"), 1.0).count() == 4)
    // and the two null-key rows always travel together
    for (f <- Seq(0.2, 0.5, 0.8)) {
      val kept = Sampling.hashSample(df, col("key"), f)
        .filter(col("key").isNull).count()
      assert(kept == 0L || kept == 2L, s"null-key rows must be all-or-nothing, got $kept at $f")
    }
  }

  test("the sample predicate reaches the scan as a pushed filter stage (no shuffle)") {
    val plan = Sampling.hashSample(
      sf0001.lineitem, col("l_orderkey"), 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hash sampling must be shuffle-free:\n$plan")
  }

  test("token-budget mixture sample derives rates from the data and hits the targets") {
    val tok = size(split(col("text"), " ")).cast("long")
    val docs = sf0001.documents
    val weights = Map("en" -> 500, "de" -> 500) // other langs dropped
    val budget = 2000L
    val got = Sampling.tokenBudgetSample(
        docs, col("doc_id"), col("lang"), tok, weights, budget)
      .groupBy("lang").agg(sum(tok).as("t")).as[(String, Long)].collect().toMap
    assert(got.keySet.subsetOf(Set("en", "de")), s"unlisted langs must be dropped: $got")
    val totals = docs.groupBy("lang").agg(sum(tok).as("t"))
      .as[(String, Long)].collect().toMap
    for ((lang, t) <- got) {
      val target = math.min(totals(lang).toDouble, 0.5 * budget)
      // hash sampling is binomial around the rate — allow a wide band,
      // the EXACT row set is what q78's oracle hash pins
      assert(t > 0.3 * target && t < 2.0 * target,
        s"$lang sampled $t tokens vs target $target")
    }
    // a stratum smaller than its share is kept whole (rate clamps at 1)
    val whole = Sampling.tokenBudgetSample(
        docs, col("doc_id"), col("lang"), tok, Map("zh" -> 1000), budgetTokens = 100000000L)
      .count()
    assert(whole == docs.filter(col("lang") === "zh").count(),
      "rate must clamp at 1.0 — no upsampling past the full stratum")
    // determinism: same rows on a different physical layout
    val a = Sampling.tokenBudgetSample(
      docs, col("doc_id"), col("lang"), tok, weights, budget)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.tokenBudgetSample(
      docs.repartition(13, col("source")), col("doc_id"), col("lang"), tok, weights, budget)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "mixture sampling must not depend on partitioning")
  }

  test("token-budget sample: NULL strata are weight-addressable via the __null__ sentinel") {
    import spark.implicits._
    val tok = col("tok")
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 100L),
      (3L, null, 100L), (4L, null, 100L)  // the unlabeled-language slice
    ).toDF("doc_id", "lang", "tok")
    // without a "__null__" weight the unlabeled slice is dropped — but
    // DELIBERATELY (documented), not by a join quirk
    val dropped = Sampling.tokenBudgetSample(
      docs, col("doc_id"), col("lang"), tok, Map("en" -> 1000), budgetTokens = 100000L)
    assert(dropped.filter(col("lang").isNull).count() == 0L)
    assert(dropped.filter(col("lang") === "en").count() == 2L)
    // with one, the whole slice is kept (rate clamps at 1)
    val kept = Sampling.tokenBudgetSample(
      docs, col("doc_id"), col("lang"), tok,
      Map("en" -> 500, "__null__" -> 500), budgetTokens = 100000L)
    assert(kept.filter(col("lang").isNull).count() == 2L,
      "a weighted __null__ stratum must keep the unlabeled slice")
  }

  test("hashSplit: total partition, stable membership under growth, fractions near target") {
    val docs = sf0001.documents
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Sampling.hashSplit(docs, col("doc_id"), splits)
    val n = docs.count()
    // every row gets exactly one label; fractions land near target
    val byS = labeled.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byS.values.sum == n, s"$byS must partition all $n docs")
    assert(byS("train") > 0.7 * n && byS("train") < 0.9 * n, s"$byS")
    // THE property randomSplit lacks: a doc's split never changes as the
    // corpus grows — the half-corpus assignment agrees with the full one
    val half = Sampling.hashSplit(
      docs.filter(col("doc_id") % 2 === 0), col("doc_id"), splits)
    val full = labeled.select("doc_id", "split").as[(Long, String)].collect().toMap
    half.select("doc_id", "split").as[(Long, String)].collect().foreach {
      case (id, s) => assert(full(id) == s, s"doc $id moved split: $s vs ${full(id)}")
    }
    // fractions must sum to 1
    val e = intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("doc_id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("temperatureMixture: closed-form reweighting, α=1 identity, tail boost") {
    // 20/80 token split: at α=0.5 the p^α ratio is √0.2 : √0.8 = 1 : 2,
    // so the reweighted shares are exactly 1/3 and 2/3
    val docs = Seq(("a", 20L), ("b", 80L), ("zero", 0L))
      .toDF("src", "n")
    val half = Sampling.temperatureMixture(
        docs, col("src"), col("n"), alpha = 0.5, budgetTokens = 100L)
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // zero-token stratum contributes nothing and is dropped
    assert(half.keySet == Set("a", "b"), s"$half")
    assert(math.abs(half("a")._4 - 1.0 / 3) < 1e-12, s"$half")
    assert(math.abs(half("b")._4 - 2.0 / 3) < 1e-12, s"$half")
    // epochs = target/available: the tail must UPSAMPLE (33.3 tokens
    // wanted from 20 available), the head downsample
    assert(math.abs(half("a")._6 - (100.0 / 3) / 20) < 1e-12, s"$half")
    assert(half("b")._6 < 1.0)
    // α = 1 keeps the natural mixture: w == p for every stratum
    val nat = Sampling.temperatureMixture(
        docs, col("src"), col("n"), alpha = 1.0, budgetTokens = 100L)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    nat.foreach(r => assert(r._3 == r._4, s"$r"))
    // α < 1 always moves the minority share UP, majority DOWN
    assert(half("a")._4 > half("a")._3 && half("b")._4 < half("b")._3)
    // NULL strata group under the sentinel, same as tokenBudgetSample
    val withNull = Seq((Option("a"), 10L), (None, 10L)).toDF("src", "n")
    val rows = Sampling.temperatureMixture(
        withNull, col("src"), col("n"), alpha = 0.7, budgetTokens = 10L)
      .select("stratum").as[String].collect().toSet
    assert(rows == Set("a", "__null__"), s"$rows")
  }

  /** The operator's exact key arithmetic, independently restated. */
  private def esKey(seed: String, id: Long, w: Double): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val u = (java.lang.Long.parseLong(hex.take(5), 16) + 1.0) / 1048576.0
    math.round(math.log(u) / w * 1e9) / 1e9
  }

  test("weightedSample: closed-form top-k per stratum, without replacement, " +
      "partition-invariant, seed redraws") {
    val rows = (1L to 40L).map(i => (i, if (i <= 20) "s1" else "s2", (i % 7 + 1) * 100.0))
    val df = rows.toDF("id", "src", "w")
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      Sampling.weightedSample(d, col("id"), col("w"), col("src"), k = 4, seed = seed)
        .select("src", "id", "wkey9", "rn").as[(String, Long, Double, Long)].collect()
    val got = run(df, "wsamp")
    // independently recompute every key and the per-stratum ranking
    val want = rows.groupBy(_._2).flatMap { case (s, rs) =>
      rs.map { case (id, _, w) => (id, esKey("wsamp", id, w)) }
        .sortBy { case (id, key) => (-key, id) }.take(4).zipWithIndex
        .map { case ((id, key), i) => (s, id, key, (i + 1).toLong) }
    }.toSet
    assert(got.toSet == want, s"got ${got.toSet}\nwant $want")
    // without replacement: 4 DISTINCT ids per stratum
    assert(got.groupBy(_._1).forall { case (_, g) => g.map(_._2).distinct.length == 4 })
    // physical layout must not matter
    assert(run(df.repartition(7), "wsamp").toSet == got.toSet)
    // a different seed is an independent redraw (some selection changes)
    assert(run(df, "epoch1").toSet != got.toSet)
  }

  test("weightedSample: zero/null weights excluded; k >= stratum size ranks everything") {
    val df = Seq((1L, "a", 10.0), (2L, "a", 0.0), (3L, "a", -5.0))
      .toDF("id", "src", "w")
      .union(Seq((4L, "a")).toDF("id", "src").withColumn("w", lit(null).cast("double")))
    val got = Sampling.weightedSample(df, col("id"), col("w"), col("src"), k = 10)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L), "only the positive-weight row is sampleable")
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, col("id"), col("w"), col("src"), k = 0)
    }
  }
}
