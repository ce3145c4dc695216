package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Edge-case pins for the chunking/packing operators (q83/q84 hash-gate
  * the fixture corpus; these pin the fenceposts the fixture may not hit). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, chunkSize: Int, stride: Int): Seq[(Long, Long)] =
    TextAnalysis.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunkSize, stride)
      .select("chunk_id", "n_tokens").as[(Long, Long)].collect().toSeq.sorted

  test("chunkTokens fenceposts: short doc, exact fit, one-over, no-overlap stride") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // shorter than one chunk → exactly one (short) chunk
    assert(chunks(words(3), 5, 4) == Seq((0L, 3L)))
    // exactly one chunk
    assert(chunks(words(5), 5, 4) == Seq((0L, 5L)))
    // one token over → a second chunk carrying the overlap + the tail
    assert(chunks(words(6), 5, 4) == Seq((0L, 5L), (1L, 2L)))
    // stride == chunkSize → disjoint chunks, remainder in the last
    assert(chunks(words(12), 5, 5) == Seq((0L, 5L), (1L, 5L), (2L, 2L)))
    // every token appears in at least one chunk: window starts cover 1..n
    val n = 23
    val got = chunks(words(n), 5, 4)
    val covered = got.map { case (k, len) => (k * 4 + 1, k * 4 + len) }
    assert(covered.head._1 == 1 && covered.last._2 == n &&
      covered.sliding(2).forall { case Seq((_, e), (s, _)) => s <= e + 1; case _ => true },
      s"chunks must tile the token sequence: $covered")
  }

  test("chunkTokens overlap carries the same tokens (fingerprints of overlap agree)") {
    // chunk k ends with the 1-token overlap that chunk k+1 starts with
    // (chunkSize 5, stride 4): verify via the md5 of a hand-built window
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val got = TextAnalysis.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), col("doc_id"), col("text"), 5, 4)
      .select("chunk_id", "chunk_md5").as[(Long, String)].collect().toMap
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got(0L) == md5hex("t1 t2 t3 t4 t5"))
    assert(got(1L) == md5hex("t5 t6 t7 t8 t9"))
  }

  test("packSequences: boundary docs, token conservation, per-shard independence") {
    // shard A: 300 + 212 fill sequence 0 exactly; the next doc STARTS at
    // offset 512 → sequence 1. shard B packs independently from offset 0.
    val docs = Seq(
      ("A", 1L, 300L), ("A", 2L, 212L), ("A", 3L, 100L),
      ("B", 10L, 600L), ("B", 11L, 50L)
    ).toDF("src", "doc_id", "tok")
    val got = TextAnalysis.packSequences(
        docs, col("src"), col("doc_id"), col("tok"), seqLen = 512L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", 0L, 2L, 512L),   // docs 1+2 fill seq 0 exactly
      ("A", 1L, 1L, 100L),   // doc 3 starts at offset 512 → seq 1
      ("B", 0L, 1L, 600L),   // doc 10 starts at 0 (oversized doc spans, but
                             // belongs to the seq of its first token)
      ("B", 1L, 1L, 50L)     // doc 11 starts at offset 600 → seq 1
    ), s"got $got")
    // conservation: every input token lands in exactly one sequence row
    assert(got.toSeq.map(_._4).sum == Seq(300L, 212L, 100L, 600L, 50L).sum)
  }

  test("pmiCollocations: association ranks above chance at equal marginals; minCount prunes") {
    // 5 docs "a a b" + 5 docs "a b b": ca = cb = 15 (equal marginals),
    // nu = 30, nb = 20; pairs (a,b):10, (a,a):5, (b,b):5. The preferred
    // ordering (a,b) scores ln 2; the same-word pairs score exactly 0 —
    // PMI separates association from frequency.
    val docs = (1 to 10).map(i => (i.toLong, if (i <= 5) "a a b" else "a b b"))
      .toDF("doc_id", "text")
    def run(minCount: Long) =
      TextAnalysis.pmiCollocations(docs, col("text"), minCount)
        .select("w1", "w2", "n_ab", "pmi")
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val got = run(1L)
    assert(got.keySet == Set("a" -> "b", "a" -> "a", "b" -> "b"), s"got $got")
    assert(got("a" -> "b")._1 == 10L)
    assert(math.abs(got("a" -> "b")._2 - math.log(2.0)) < 1e-12, s"got $got")
    assert(math.abs(got("a" -> "a")._2) < 1e-12 && math.abs(got("b" -> "b")._2) < 1e-12)
    // minCount prunes the 5-count pairs before the joins
    assert(run(6L).keySet == Set("a" -> "b"))
  }

  test("unigramSurprisal: closed-form scores; rare-token doc scores higher") {
    // corpus: a×3, b×2 -> N=5; no smoothing needed (corpus is the LM)
    val docs = Seq((1L, "a a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_tok", "surprisal")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pa = 3.0 / 5.0
    val pb = 2.0 / 5.0
    assert(got(1L)._1 == 4L && got(2L)._1 == 1L)
    assert(math.abs(got(1L)._2 - -(3 * math.log(pa) + math.log(pb)) / 4.0) < 1e-12)
    assert(math.abs(got(2L)._2 - -math.log(pb)) < 1e-12)
    // the doc made of the rarer token is more surprising
    assert(got(2L)._2 > got(1L)._2)
  }

  test("jsDivergence: 0 for identical slices, ln 2 for disjoint, symmetric between") {
    def df(texts: String*) = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def js(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      TextAnalysis.jsDivergence(a, b, col("text"))
        .select("n_a", "n_b", "vocab", "js")
        .as[(Long, Long, Long, Double)].head()
    // identical distributions -> exactly 0
    val same = js(df("a b a"), df("b a a"))
    assert(same == ((3L, 3L, 2L, 0.0)), s"got $same")
    // disjoint supports -> the JS maximum ln 2
    val disjoint = js(df("a a"), df("b c"))
    assert(disjoint._3 == 3L)
    assert(math.abs(disjoint._4 - math.log(2.0)) < 1e-12, s"got $disjoint")
    // strictly between for partial overlap, and symmetric
    val ab = js(df("a a a b"), df("a b b b"))
    val ba = js(df("a b b b"), df("a a a b"))
    assert(ab._4 > 0.0 && ab._4 < math.log(2.0))
    assert(math.abs(ab._4 - ba._4) < 1e-12, s"$ab vs $ba")
  }

  test("dsirWeights: target-like docs score above raw-like docs; smoothing keeps finite") {
    // target domain speaks {alpha beta gamma}, raw speaks {delta epsilon zeta}
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta alpha gamma beta alpha", true),
      (3L, "delta epsilon zeta delta epsilon zeta delta epsilon", false),
      (4L, "epsilon zeta delta zeta delta epsilon zeta delta", false),
      // score targets: one doc per dialect, NOT in either training slice
      (10L, "alpha beta gamma beta alpha gamma", false),
      (11L, "delta epsilon zeta epsilon delta zeta", false)
    ).toDF("id", "text", "tgt")
    // exclude the score targets from BOTH distributions via a 3-way flag:
    // here simply mark them raw; their own 6 tokens barely move the raw
    // distribution, the ordering assertion is robust to that
    val w = TextAnalysis.dsirWeights(docs, col("id"), col("text"), col("tgt"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("weight")).toMap
    assert(w(10L) > 0, s"target-dialect doc must have positive log-ratio, got ${w(10L)}")
    assert(w(11L) < 0, s"raw-dialect doc must have negative log-ratio, got ${w(11L)}")
    assert(w(10L) > w(11L))
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite), s"smoothing must keep weights finite: $w")
    intercept[IllegalArgumentException](
      TextAnalysis.dsirWeights(docs, col("id"), col("text"), col("tgt"), buckets = 1))
  }

  test("bigramCrossEntropy: in-domain text scores lower; unseen bigrams get the smoothed floor") {
    val docs = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the cat ran on the mat", true),
      (10L, "the cat sat on the mat", false), // verbatim in-domain
      (11L, "zig zag zog zig zag zog", false) // fully out-of-domain
    ).toDF("id", "text", "tgt")
    val out = TextAnalysis.bigramCrossEntropy(docs, col("id"), col("text"), col("tgt"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_bigrams"), r.getAs[Double]("ce")))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(10L)._2 < out(11L)._2,
      s"in-domain must score lower CE: ${out(10L)._2} vs ${out(11L)._2}")
    assert(out(10L)._1 == 5L && out(11L)._1 == 5L)
    // closed form for doc 11: V = 6 distinct target unigrams (the, cat,
    // sat, ran, on, mat); every bigram unseen (c2 = 0) and every prefix
    // unseen (c1 = 0) -> p = 1/6 each -> ce = ln 6
    assert(math.abs(out(11L)._2 - math.log(6)) < 1e-12, s"got ${out(11L)._2}")
  }

  test("logisticTrain learns a separable boundary and logisticScore applies it") {
    // y = 1 iff x > 0 — linearly separable on one feature; after a few
    // full-batch steps the model must classify every point correctly
    val pts = Seq(-3.0, -2.0, -1.5, -0.5, 0.5, 1.5, 2.0, 3.0)
      .map(x => (x, if (x > 0) 1.0 else 0.0)).toDF("x", "y")
    val w = TextAnalysis.logisticTrain(pts, Seq(col("x")), col("y"),
      iters = 25, lr = 1.0)
    assert(w.length == 2 && w(1) > 0, s"slope must be positive: ${w.toSeq}")
    val scored = TextAnalysis.logisticScore(pts, Seq(col("x")), w)
      .select(col("y"), col("p")).as[(Double, Double)].collect()
    assert(scored.forall { case (y, p) => (p > 0.5) == (y == 1.0) },
      s"misclassified: ${scored.toSeq}")
    // and training moved the loss: mean logistic loss under w beats w=0
    // (ln 2 per point)
    val loss = scored.map { case (y, p) =>
      -(y * math.log(p) + (1 - y) * math.log(1 - p)) }.sum / scored.length
    assert(loss < math.log(2) * 0.5, s"loss $loss barely moved")
  }

  test("logisticTrain weight trajectory is bit-identical across partitionings") {
    // the gradient-grid-rounding determinism claim: a float sum's
    // partition-order wobble (~1e-15 relative) must never reach the
    // weights. 1 partition vs 7 partitions, same data.
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 500).map { i =>
      val x1 = rnd.nextDouble() * 2 - 1; val x2 = rnd.nextDouble()
      (x1, x2, if (x1 + 0.3 * x2 > 0.1) 1.0 else 0.0)
    }
    val a = TextAnalysis.logisticTrain(rows.toDF("x1", "x2", "y").repartition(1),
      Seq(col("x1"), col("x2")), col("y"), iters = 6, lr = 0.5)
    val b = TextAnalysis.logisticTrain(rows.toDF("x1", "x2", "y").repartition(7),
      Seq(col("x1"), col("x2")), col("y"), iters = 6, lr = 0.5)
    assert(a.toSeq == b.toSeq,
      s"weights diverged across partitionings:\n${a.toSeq}\n${b.toSeq}")
  }

  test("gridRound snaps to the 1e-9 grid with floor(x*1e9 + 0.5)/1e9 semantics") {
    assert(TextAnalysis.gridRound(0.1234567894) == 0.123456789)
    assert(TextAnalysis.gridRound(0.1234567896) == 0.12345679)
    assert(TextAnalysis.gridRound(-0.1234567894) == -0.123456789)
    assert(TextAnalysis.gridRound(0.0) == 0.0)
  }

  test("logisticTrainHashed separates token classes with the weights as a table") {
    // even docs say "good", odd say "bad" — perfectly separable through
    // the hashed buckets; the trained TABLE model must split them
    val docs = (1 to 40).map(i => (i.toLong,
      if (i % 2 == 0) "good good stuff here" else "bad bad stuff here",
      if (i % 2 == 0) 1.0 else 0.0)).toDF("id", "text", "y")
    val w = TextAnalysis.logisticTrainHashed(docs, col("id"), col("text"),
      col("y"), dims = 64, iters = 12, lr = 1.0)
    // weight table = one row per occupied bucket + the bias bucket (64)
    val wm = w.as[(Long, Double)].collect().toMap
    assert(wm.contains(64L), "bias bucket must be present")
    val scored = TextAnalysis.logisticScoreHashed(docs, col("id"), col("text"),
        w, dims = 64)
      .select(col("id"), col("p")).as[(Long, Double)].collect().toMap
    (1 to 40).foreach { i =>
      val want = i % 2 == 0
      assert((scored(i.toLong) > 0.5) == want,
        s"doc $i misclassified: p=${scored(i.toLong)}")
    }
  }

  test("logisticTrainHashed weight table is identical across partitionings") {
    val rnd = new scala.util.Random(3L)
    val docs = (1 to 120).map { i =>
      val words = (0 until 8).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
      (i.toLong, words, if (rnd.nextBoolean()) 1.0 else 0.0)
    }
    def train(parts: Int) = TextAnalysis.logisticTrainHashed(
        docs.toDF("id", "text", "y").repartition(parts),
        col("id"), col("text"), col("y"), dims = 16, iters = 4, lr = 0.5)
      .as[(Long, Double)].collect().toMap
    val a = train(1)
    val b = train(7)
    assert(a == b, s"weight tables diverged:\n$a\n$b")
  }

  test("logisticTrain drops null-feature/label rows entirely — no denominator bias") {
    val clean = Seq((1.0, 1.0), (-1.0, 0.0), (2.0, 1.0), (-2.0, 0.0))
    val dirty = clean.map { case (x, y) =>
      (Option(x), Option(y)) } :+ ((Option.empty[Double], Option(1.0))) :+
      ((Option(5.0), Option.empty[Double]))
    val a = TextAnalysis.logisticTrain(clean.toDF("x", "y"),
      Seq(col("x")), col("y"), 5, 0.5)
    val b = TextAnalysis.logisticTrain(dirty.toDF("x", "y"),
      Seq(col("x")), col("y"), 5, 0.5)
    // a null row must neither contribute to the gradient NOR inflate n
    assert(a.toSeq == b.toSeq,
      s"null rows changed the trajectory:\n${a.toSeq}\n${b.toSeq}")
  }

  test("logisticTrain resumes from checkpointed weights exactly (memoryless GD)") {
    val rnd = new scala.util.Random(11L)
    val df = (1 to 200).map { _ =>
      val x = rnd.nextDouble() * 4 - 2
      (x, if (x > 0.5) 1.0 else 0.0)
    }.toDF("x", "y")
    val full = TextAnalysis.logisticTrain(df, Seq(col("x")), col("y"), 8, 0.5)
    val half = TextAnalysis.logisticTrain(df, Seq(col("x")), col("y"), 3, 0.5)
    val resumed = TextAnalysis.logisticTrain(df, Seq(col("x")), col("y"), 5, 0.5,
      init = Some(half))
    assert(resumed.toSeq == full.toSeq,
      s"train(3)+train(5, init) must equal train(8):\n${resumed.toSeq}\n${full.toSeq}")
    // and the init array is not mutated in place
    val before = half.toSeq
    TextAnalysis.logisticTrain(df, Seq(col("x")), col("y"), 1, 0.5, Some(half))
    assert(half.toSeq == before, "init weights must not be mutated")
    intercept[IllegalArgumentException] {
      TextAnalysis.logisticTrain(df, Seq(col("x")), col("y"), 1, 0.5,
        Some(Array(0.0)))
    }
  }

  test("hashedTfidfVectors: closed-form weights, idf-0 buckets exactly zero, null ids dropped") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "a b"),
      (java.lang.Long.valueOf(2L), "a c"),
      (null.asInstanceOf[java.lang.Long], "ghost")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.hashedTfidfVectors(docs, col("doc_id"), col("text"), 64)
      .select(col("id"), col("vec")).as[(Long, Seq[Double])].collect().toMap
    assert(got.keySet == Set(1L, 2L), "null-id doc must be dropped")
    assert(got(1L).length == 64)
    // 'a' is in every doc -> idf ln(2/2) = 0 exactly; 'b'/'c' carry
    // 1 * ln(2/1): exactly one nonzero component per doc, value ln 2
    assert(got(1L).count(_ != 0.0) == 1 && got(2L).count(_ != 0.0) == 1)
    assert(got(1L).sum == math.log(2.0) && got(2L).sum == math.log(2.0))
    // tf weighting: a doc repeating its token doubles the weight
    val rep = TextAnalysis.hashedTfidfVectors(
        Seq((1L, "b b"), (2L, "a")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 64)
      .select(col("id"), col("vec")).as[(Long, Seq[Double])].collect().toMap
    assert(rep(1L).sum == 2.0 * math.log(2.0))
  }

  test("hashedTfidfVectors: total mass survives bucket collisions (dims 2)") {
    // nonneg weights cannot cancel, so Σ vec == Σ tf·idf no matter how
    // tokens collide — the invariant q140's vsum6 gate rests on
    val docs = Seq((1L, "x y z"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedTfidfVectors(docs, col("doc_id"), col("text"), 2)
      .select(col("id"), col("vec")).as[(Long, Seq[Double])].collect().toMap
    assert(got(1L).length == 2)
    // y, z unique (idf ln 2), x everywhere (idf 0)
    assert(math.abs(got(1L).sum - 2.0 * math.log(2.0)) < 1e-12)
    assert(got(2L).sum == 0.0)
    intercept[IllegalArgumentException] {
      TextAnalysis.hashedTfidfVectors(docs, col("doc_id"), col("text"), 1)
    }
  }

  test("prCurve computes exact confusion counts and handles empty-prediction thresholds") {
    // scores: positives at 0.9, 0.6; negatives at 0.7, 0.2
    val scored = Seq((0.9, true), (0.6, true), (0.7, false), (0.2, false))
      .toDF("p", "y")
    val got = TextAnalysis.prCurve(scored, col("y"), col("p"),
        Seq(0.5, 0.8, 0.95))
      .collect().map(r => r.getAs[Double]("thr") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Long]("tn"), Option(r.getAs[java.lang.Double]("precision")),
          Option(r.getAs[java.lang.Double]("recall"))))).toMap
    // t=0.5: predicts {0.9, 0.6, 0.7} positive → tp 2, fp 1, fn 0, tn 1
    assert(got(0.5) == ((2L, 1L, 0L, 1L, Some(2.0 / 3), Some(1.0))))
    // t=0.8: only 0.9 → tp 1, fp 0 (both negatives below) → precision 1
    assert(got(0.8) == ((1L, 0L, 1L, 2L, Some(1.0), Some(0.5))))
    // t=0.95: nothing predicted positive → precision NULL, recall 0
    assert(got(0.95) == ((0L, 0L, 2L, 2L, None, Some(0.0))))
  }

  test("prCurve with no positive labels reports NULL recall, and rejects empty thresholds") {
    val scored = Seq((0.9, false), (0.1, false)).toDF("p", "y")
    val r = TextAnalysis.prCurve(scored, col("y"), col("p"), Seq(0.5)).collect()(0)
    assert(Option(r.getAs[java.lang.Double]("recall")).isEmpty)
    assert(r.getAs[Long]("tn") == 1L && r.getAs[Long]("fp") == 1L)
    intercept[IllegalArgumentException] {
      TextAnalysis.prCurve(scored, col("y"), col("p"), Seq.empty)
    }
  }

  test("calibrationCurve bins predictions with p=1.0 in the top bin and exact fractions") {
    val scored = Seq((0.05, false), (0.95, true), (0.95, false), (1.0, true))
      .toDF("p", "y")
    val got = TextAnalysis.calibrationCurve(scored, col("y"), col("p"), bins = 10)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean_p"),
          r.getAs[Double]("frac_pos")))).toMap
    assert(got.keySet == Set(0L, 9L))
    assert(got(0L) == ((1L, 0.05, 0.0)))
    val (n9, mp9, fp9) = got(9L)
    assert(n9 == 3L && fp9 == 2.0 / 3)
    assert(math.abs(mp9 - (0.95 + 0.95 + 1.0) / 3) < 1e-12)
    intercept[IllegalArgumentException] {
      TextAnalysis.calibrationCurve(scored, col("y"), col("p"), bins = 1)
    }
  }

  test("logisticTrain/Score validate their shape arguments") {
    val df = Seq((1.0, 1.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      TextAnalysis.logisticTrain(df, Seq.empty, col("y"), 3, 0.5)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.logisticScore(df, Seq(col("x")), Array(0.0, 0.0, 0.0))
    }
  }

  // ── rocAuc (exact Mann–Whitney with tie correction) ────────────────────

  private def auc(rows: Seq[(Double, Double)]): (Long, Long, Long, Option[Double]) =
    TextAnalysis.rocAuc(rows.toDF("y", "s"), col("y") === 1.0, col("s"))
      .as[(Long, Long, Long, Option[Double])].head()

  test("rocAuc: perfect separation is 1.0, inverted is 0.0") {
    val (np, nn, num2, a) =
      auc(Seq((1.0, 0.9), (1.0, 0.8), (0.0, 0.2), (0.0, 0.1)))
    assert((np, nn, num2) == (2L, 2L, 8L) && a.contains(1.0))
    val (_, _, num2i, ai) =
      auc(Seq((0.0, 0.9), (0.0, 0.8), (1.0, 0.2), (1.0, 0.1)))
    assert(num2i == 0L && ai.contains(0.0))
  }

  test("rocAuc: a constant score is chance (0.5) via the tie correction") {
    val (_, _, num2, a) =
      auc(Seq((1.0, 0.5), (1.0, 0.5), (0.0, 0.5), (0.0, 0.5)))
    assert(num2 == 4L && a.contains(0.5))
  }

  test("rocAuc: hand-computed mixed case with a pos/neg tie") {
    // pairs: (p=.3 vs n=.1) wins, (p=.3 vs n=.3) half, (p=.5 vs both) wins
    // -> (1 + 0.5 + 2) / 4 = 0.875
    val (np, nn, num2, a) =
      auc(Seq((1.0, 0.3), (1.0, 0.5), (0.0, 0.3), (0.0, 0.1)))
    assert((np, nn) == (2L, 2L))
    assert(num2 == 7L, s"num2 $num2")
    assert(a.contains(0.875))
  }

  test("rocAuc: single-class input yields NULL, not a crash") {
    val (np, nn, _, a) = auc(Seq((1.0, 0.9), (1.0, 0.1)))
    assert(np == 2L && nn == 0L && a.isEmpty)
  }

  test("rocAuc is invariant to partitioning and to any monotone score transform") {
    val rows = (0 until 200).map { i =>
      (if ((i * 7) % 3 == 0) 1.0 else 0.0, ((i * 31) % 17) / 17.0)
    }
    val base = TextAnalysis.rocAuc(rows.toDF("y", "s"), col("y") === 1.0, col("s"))
      .as[(Long, Long, Long, Option[Double])].head()
    val shuffled = TextAnalysis.rocAuc(rows.toDF("y", "s").repartition(13),
        col("y") === 1.0, col("s"))
      .as[(Long, Long, Long, Option[Double])].head()
    assert(base == shuffled)
    // AUC is a RANK statistic: exp(s) must not move it
    val mono = TextAnalysis.rocAuc(rows.toDF("y", "s"), col("y") === 1.0, exp(col("s")))
      .as[(Long, Long, Long, Option[Double])].head()
    assert(mono == base)
  }

  test("unigramDivergence: both closed forms on an asymmetric fixture, zero on identical " +
      "slices, finite on disjoint vocabularies, JS bounded") {
    def div(rows: Seq[(String, String)]) = {
      val df = rows.toDF("side", "text")
      TextAnalysis.unigramDivergence(df, col("text"),
        col("side") === "a", col("side") === "b")
        .as[(Long, Long, Long, Double, Double, Double)].head()
    }
    // A = "x x y", B = "x z z" — union vocab {x,y,z},
    // smoothed pa = (.5, 1/3, 1/6), pb = (1/3, 1/6, .5)
    val (v, ta, tb, klAb, klBa, js) = div(Seq("a" -> "x x y", "b" -> "x z z"))
    assert((v, ta, tb) == (3L, 3L, 3L))
    val wantAb = 0.5 * math.log(0.5 / (1.0 / 3)) +
      (1.0 / 3) * math.log((1.0 / 3) / (1.0 / 6)) +
      (1.0 / 6) * math.log((1.0 / 6) / 0.5)
    assert(math.abs(klAb - wantAb) < 1e-12, s"kl_ab $klAb vs closed form $wantAb")
    // KL is NOT symmetric — the reverse direction has its own closed form
    val wantBa = (1.0 / 3) * math.log((1.0 / 3) / 0.5) +
      (1.0 / 6) * math.log((1.0 / 6) / (1.0 / 3)) +
      0.5 * math.log(0.5 / (1.0 / 6))
    assert(math.abs(klBa - wantBa) < 1e-12, s"kl_ba $klBa vs closed form $wantBa")
    assert(math.abs(klAb - klBa) > 0.01, "the fixture is deliberately asymmetric")
    assert(js > 0 && js <= math.log(2.0) + 1e-12)
    // identical slices: every divergence is exactly 0 (pa == pb per term)
    val same = div(Seq("a" -> "x y z", "b" -> "x y z"))
    assert(same._4 == 0.0 && same._5 == 0.0 && same._6 == 0.0)
    // disjoint vocabularies: smoothing keeps everything finite, JS near ln 2
    val dis = div(Seq("a" -> "x x x x", "b" -> "y y y y"))
    assert(!dis._4.isInfinite && !dis._5.isInfinite)
    assert(dis._6 > 0.2 && dis._6 <= math.log(2.0) + 1e-12)
  }

  test("bm25TopK: closed-form scores on a 3-doc fixture, partial matches, tie-break") {
    val docs = Seq(
      (1L, "x x y"), (2L, "x z"), (3L, "y y y z"),
      (4L, "x x y"), // exact duplicate of doc 1 — same score, tie to lower id
      (5L, "")).toDF("doc_id", "text") // empty doc: no tokens, excluded from N
    val probes = Seq((0L, "x"), (0L, "y")).toDF("qid", "term")
    val got = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"), probes, k = 5)
      .select("qid", "doc_id", "score6", "n_terms", "rn")
      .as[(Long, Long, Double, Long, Long)].collect().sortBy(_._5)
    // closed-form BM25 (k1=1.2, b=0.75) over the token counts:
    // N=4 (doc 5 has no tokens), avgdl=(3+2+4+3)/4=3, df(x)=3, df(y)=3
    val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    def w(tf: Long, dl: Long): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    // Rounding.portable's scaled-double form, exactly
    def r6(x: Double): Double = math.round(x * 1e6).toDouble / 1e6
    val s1 = r6(w(2, 3) + w(1, 3)) // docs 1 and 4, both terms
    val s2 = r6(w(1, 2))           // doc 2, x only
    val s3 = r6(w(3, 4))           // doc 3, y only
    assert(got.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((1L, s1, 2L), (4L, s1, 2L), (3L, s3, 1L), (2L, s2, 1L))
        .sortBy { case (id, s, _) => (-s, id) },
      s"got ${got.toSeq}; want scores s1=$s1 s3=$s3 s2=$s2")
    // ranks are 1..4 and the duplicate pair tie-broke by doc_id
    assert(got.map(_._5).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.filter(r => r._2 == 1L || r._2 == 4L).map(_._2).toSeq == Seq(1L, 4L))
  }

  test("bm25TopK: df stays FULL-corpus for probe terms; k bounds each query's rows") {
    // a term appearing in many docs gets a lower idf even when only few
    // rows reach the top-k — df must come from the corpus, not survivors
    val docs = ((1L to 9L).map(i => (i, "common")) :+ (10L, "rare common"))
      .toDF("doc_id", "text")
    val probes = Seq((0L, "common"), (1L, "rare")).toDF("qid", "term")
    val got = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"), probes, k = 3)
      .select("qid", "doc_id", "score6", "n_terms", "rn")
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(got.count(_._1 == 0L) == 3, "k must bound the common query")
    assert(got.filter(_._1 == 1L).map(_._2).toSeq == Seq(10L))
    // rare (df=1) must outscore common (df=10) at equal tf/dl
    val rareScore = got.find(_._1 == 1L).get._3
    val commonTop = got.filter(_._1 == 0L).map(_._3).max
    assert(rareScore > commonTop)
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"), probes, k = 0)
    }
  }

  test("cohensKappa: textbook 2x2 closed form, identity, chance floor") {
    // the classic confusion: 20 yes/yes, 15 no/no, 5 yes/no, 10 no/yes
    // po = 35/50 = 0.7; pe = (25·30 + 25·20)/50² = 1250/2500 = 0.5
    // kappa = (0.7 − 0.5)/(1 − 0.5) = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes"))
    val df = rows.toDF("ra", "rb")
    val (n, agree, peNum, kappa) = TextAnalysis.cohensKappa(df, col("ra"), col("rb"))
      .as[(Long, Long, Long, Double)].head()
    assert((n, agree, peNum) == ((50L, 35L, 1250L)))
    assert(math.abs(kappa - 0.4) < 1e-12, s"kappa $kappa != 0.4")
    // identical raters → kappa = 1 (unless pe = 1)
    val same = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("ra", "rb")
    val k1 = TextAnalysis.cohensKappa(same, col("ra"), col("rb"))
      .select("kappa").as[Double].head()
    assert(math.abs(k1 - 1.0) < 1e-12)
    // degenerate pe = 1 (both raters constant AND equal, pe_num = n²):
    // the raw formula is 0/0 — the guard must return exactly 1.0, not
    // NaN (ADVICE r16: a single-category corpus would NaN the q166 gate)
    val constEq = Seq.fill(4)(("a", "a")).toDF("ra", "rb")
    val kc = TextAnalysis.cohensKappa(constEq, col("ra"), col("rb"))
      .as[(Long, Long, Long, Double)].head()
    assert(kc == ((4L, 4L, 16L, 1.0)),
      s"constant-equal raters: pe_num = n² must yield kappa = 1, got $kc")
    // a rater that always answers the majority class: high accuracy
    // (po = 0.75), kappa exactly 0 — the chance floor accuracy hides
    val majority = (Seq.fill(3)(("yes", "yes")) :+ (("yes", "no")))
      .toDF("ra", "rb")
    val k0 = TextAnalysis.cohensKappa(majority, col("ra"), col("rb"))
      .as[(Long, Long, Long, Double)].head()
    assert(k0._2 == 3L, "po must read 0.75 (high accuracy)")
    assert(k0._4 == 0.0, s"constant rater must score kappa 0, got ${k0._4}")
    // disjoint label sets: agreement impossible, pe_num = 0, kappa < 0
    val disjoint = Seq(("x", "y"), ("x", "z")).toDF("ra", "rb")
    val kd = TextAnalysis.cohensKappa(disjoint, col("ra"), col("rb"))
      .as[(Long, Long, Long, Double)].head()
    assert(kd._3 == 0L && kd._2 == 0L && kd._4 == 0.0,
      s"disjoint labels: agree = pe_num = 0 so kappa = 0/1·n² → 0, got $kd")
  }

  test("robustStats: hand quantiles, MAD, trim bounds, Tukey outliers; approx swap") {
    // group g1: x = 1..9 plus a 1000 outlier (n = 10)
    //   sorted: 1,2,...,9,1000; p25 at pos 0.25·9 = 2.25 → 3.25
    //   med at pos 4.5 → 5.5 ; p75 at 6.75 → 7.75 ; IQR = 4.5
    //   fences: [3.25 − 6.75, 7.75 + 6.75] = [−3.5, 14.5] → one outlier
    //   MAD: |x − 5.5| sorted = 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5
    //     → median = 2.5
    //   p10 at 0.9 → 1.9 ; p90 at 8.1 → 9 + 0.1·991 = 108.1
    //     → trim keeps 2..9 → mean 5.5
    val g1 = (1 to 9).map(i => ("g1", i.toDouble)) :+ (("g1", 1000.0))
    val df = g1.toDF("g", "x")
    val row = TextAnalysis.robustStats(df, col("g"), col("x"))
      .as[(String, Long, Double, Double, Double, Double, Double, Double, Long)]
      .head()
    val (_, n, p25, med, p75, iqr, mad, trimmed, outliers) = row
    assert(n == 10L)
    assert(math.abs(p25 - 3.25) < 1e-12 && math.abs(med - 5.5) < 1e-12 &&
      math.abs(p75 - 7.75) < 1e-12 && math.abs(iqr - 4.5) < 1e-12)
    assert(math.abs(mad - 2.5) < 1e-12, s"mad $mad != 2.5")
    assert(math.abs(trimmed - 5.5) < 1e-12, s"trimmed_mean $trimmed != 5.5")
    assert(outliers == 1L, s"exactly the 1000 must sit outside Tukey's fences")
    // the 100 TB swap: approx_percentile (Greenwald–Khanna, mergeable,
    // one pass) within its rank-error bound of the exact form — at
    // accuracy 10000 over n = 10 rows the permitted rank error is < 1
    // rank, so the approx median must land on an adjacent ORDER
    // STATISTIC of the exact interpolated median
    val approxMed = df.groupBy("g")
      .agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("amed"))
      .select("amed").as[Double].head()
    assert(approxMed == 5.0 || approxMed == 6.0,
      s"approx median $approxMed not an adjacent order statistic of 5.5")
  }

  test("isotonicCalibration: PAV pools exactly the violating bins; mass preserved") {
    // bins 1..4 with means [0.2, 0.5, 0.4, 0.8] — only (2,3) violate
    // monotonicity, pooling to (5+4)/20 = 0.45; the ends stay untouched
    val rows = Seq((1, 2), (2, 5), (3, 4), (4, 8)).flatMap { case (b, pos) =>
      (0 until 10).map(i => (b / 10.0 + 0.05, i < pos))
    }.toDF("p", "y")
    val got = TextAnalysis.isotonicCalibration(rows, col("y"), col("p"), bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), "one row per NON-EMPTY bin only")
    assert(got.map(_._4).toSeq == Seq(0.2, 0.45, 0.45, 0.8), s"fit: ${got.toSeq}")
    // the fit is nondecreasing and preserves total positive mass
    assert(got.map(_._4).toSeq == got.map(_._4).sorted.toSeq)
    val mass = got.map { case (_, n, _, f) => n * f }.sum
    assert(math.abs(mass - got.map(_._3).sum) < 1e-9, s"mass $mass")
    // a fully decreasing curve pools to one global block
    val dec = Seq((0, 9), (5, 5), (9, 1)).flatMap { case (b, pos) =>
      (0 until 10).map(i => (b / 10.0 + 0.05, i < pos))
    }.toDF("p", "y")
    val flat = TextAnalysis.isotonicCalibration(dec, col("y"), col("p"), bins = 10)
      .select("fitted").as[Double].collect().toSet
    assert(flat == Set(0.5), s"anti-monotone input must pool globally: $flat")
    intercept[IllegalArgumentException](
      TextAnalysis.isotonicCalibration(rows, col("y"), col("p"), bins = 1))
  }

  test("groupedOls: hand-computed closed form; degenerate groups report NULL not div0") {
    // perfect line y = 2x: slope 2, intercept 0, r2 = 1 exactly
    val line = Seq(("a", 1, 2), ("a", 2, 4), ("a", 3, 6)).toDF("g", "x", "y")
    val l = TextAnalysis.groupedOls(line, col("g"), col("x"), col("y"))
      .select("n", "slope", "intercept", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(l == ((3L, 2.0, 0.0, 1.0)), s"perfect line: $l")
    // hand-worked noisy fixture: moments (n=4, sx=6, sy=8, sxy=16,
    // sxx=14, syy=20) → slope 16/20 = 0.8, intercept 0.8, r2 = 0.8
    val noisy = Seq(("b", 0, 1), ("b", 1, 1), ("b", 2, 3), ("b", 3, 3)).toDF("g", "x", "y")
    val m = TextAnalysis.groupedOls(noisy, col("g"), col("x"), col("y"))
      .select("slope", "intercept", "r2").as[(Double, Double, Double)].head()
    assert(m._1 == 0.8 && m._3 == 0.8, s"noisy fixture: $m")
    // intercept = (8 − 0.8·6)/4 carries one IEEE rounding (0.8·6 is not
    // exact); the VALUE is fixed and engine-identical, just not 0.8
    assert(math.abs(m._2 - 0.8) < 1e-12, s"noisy intercept: ${m._2}")
    // constant x cannot be fit: NULLs, never a divide-by-zero artifact
    val const = Seq(("c", 5, 1), ("c", 5, 9)).toDF("g", "x", "y")
    val r = TextAnalysis.groupedOls(const, col("g"), col("x"), col("y"))
      .select("slope", "intercept", "r2").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2), s"degenerate: $r")
    // NULL x/y rows are excluded from the moments, not zero-counted
    val withNull = Seq(("d", Some(1), Some(2)), ("d", None, Some(9)),
      ("d", Some(2), Some(4))).toDF("g", "x", "y")
    val d = TextAnalysis.groupedOls(withNull, col("g"), col("x"), col("y"))
      .select("n", "slope").as[(Long, Double)].head()
    assert(d == ((2L, 2.0)), s"null exclusion: $d")
  }

  test("giniByGroup: closed-form extremes and a hand-worked middle; zero-mass NULLs") {
    val df = Seq(
      ("even", 1L, 1), ("even", 2L, 1), ("even", 3L, 1), ("even", 4L, 1),
      ("max", 11L, 0), ("max", 12L, 0), ("max", 13L, 0), ("max", 14L, 10),
      ("mid", 21L, 1), ("mid", 22L, 2), ("mid", 23L, 3), ("mid", 24L, 4),
      ("zero", 31L, 0), ("zero", 32L, 0)
    ).toDF("g", "id", "x")
    val got = TextAnalysis.giniByGroup(df, col("g"), col("x"), col("id"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got("even") == ((4L, 4L, Some(0.0))), s"uniform mass: ${got("even")}")
    // one doc owns everything: G = (n-1)/n = 0.75 exactly
    assert(got("max") == ((4L, 10L, Some(0.75))), s"max concentration: ${got("max")}")
    // [1,2,3,4]: 2*30/(4*10) - 5/4 = 0.25 exactly
    assert(got("mid") == ((4L, 10L, Some(0.25))), s"hand-worked: ${got("mid")}")
    // all-zero mass cannot be ranked into shares: NULL, not a div0
    assert(got("zero")._3.isEmpty, s"zero mass: ${got("zero")}")
    // a negative mass fails at execution with the group named (out-of-
    // range G and the mixed-sign-sums-to-zero masquerade are both
    // rejected at the source)
    val neg = TextAnalysis.giniByGroup(
      Seq(("bad", 1L, -1), ("bad", 2L, 3)).toDF("g", "id", "x"),
      col("g"), col("x"), col("id"))
    val ex = intercept[Exception](neg.collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}|${msgs(t.getCause)}"
    assert(msgs(ex).contains("negative value in group"), msgs(ex).take(300))
  }

  test("quantileTransform: mid-rank ECDF exact on ties, NULL passthrough, monotone-invariant") {
    // scores [10, 20, 20, 30]: F(10) = (0+1)/4, F(20) = (1+1.5)/4,
    // F(30) = (3+1)/4 — the tie group shares its average rank and the
    // unique max maps to exactly 1
    val df = Seq((1L, Some(10)), (2L, Some(20)), (3L, Some(20)),
      (4L, Some(30)), (5L, None)).toDF("id", "s")
    val got = TextAnalysis.quantileTransform(df, col("s"), "q")
      .orderBy("id").select("q").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(0.25), Some(0.625), Some(0.625), Some(1.0), None),
      s"positions: ${got.toSeq}")
    // a monotone transformation of the score changes nothing (the
    // property rank normalization exists for)
    val viaSquare = TextAnalysis.quantileTransform(
        df.withColumn("s2", col("s") * col("s")), col("s2"), "q")
      .orderBy("id").select("q").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(viaSquare.toSeq == got.toSeq, "monotone transform must preserve positions")
  }

  test("quantileTransformBinned: bin midpoints track the exact ECDF within 1/(2·bins); NULL passthrough") {
    // 128 distinct uniform scores: the exact mid-rank position of score
    // i is (i + 0.5)/128; with bins = 16 the binned position is its
    // bin's midpoint — within 1/(2·16) of exact for every row
    val df = (0 until 128).map(i => (i.toLong, Option(i * 3.0 + 1))).toDF("id", "s")
    val exact = TextAnalysis.quantileTransform(df, col("s"), "q")
      .select("id", "q").as[(Long, Double)].collect().toMap
    val binned = TextAnalysis.quantileTransformBinned(df, col("s"), "q", bins = 16)
      .select("id", "q").as[(Long, Double)].collect().toMap
    assert(binned.size == 128)
    binned.foreach { case (id, b) =>
      assert(math.abs(b - exact(id)) <= 1.0 / 32 + 1e-12,
        s"id $id: binned $b vs exact ${exact(id)}")
      assert(b > 0.0 && b < 1.0, s"id $id: position $b out of (0,1)")
    }
    // positions take exactly the 16 midpoint values, 8 rows each
    // (equal-population edges by construction)
    val hist = binned.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(hist.keySet == (0 until 16).map(b => (b + 0.5) / 16).toSet, s"$hist")
    assert(hist.values.forall(_ == 8), s"equal population expected: $hist")
    // monotone: binned position never decreases with the score
    val sorted = binned.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted, "binned transform must be monotone")
    // the sketch-edge scale path reproduces the exact-edge positions on
    // fixture-sized input (approx_percentile is exact below its accuracy)
    val approx = TextAnalysis.quantileTransformBinned(
        df, col("s"), "q", bins = 16, approxEdges = true)
      .select("id", "q").as[(Long, Double)].collect().toMap
    binned.foreach { case (id, b) =>
      assert(approx(id) == b, s"id $id: approx ${approx(id)} vs $b") }
    // NULL scores pass through NULL
    val withNull = df.union(Seq((999L, Option.empty[Double])).toDF("id", "s"))
    val n = TextAnalysis.quantileTransformBinned(withNull, col("s"), "q", bins = 4)
      .filter(col("id") === 999L).select("q").collect().head
    assert(n.isNullAt(0), "NULL score must map to NULL position")
    // empty input fails loudly (no edges exist)
    intercept[IllegalArgumentException](
      TextAnalysis.quantileTransformBinned(
        df.filter(col("id") < 0), col("s"), "q"))
  }

  test("rrfFuse: exact reciprocal-rank arithmetic, cross-list boost, tie-breaks") {
    val listA = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L)).toDF("qid", "id", "rn")
    val listB = Seq((1L, 20L, 1L), (1L, 40L, 2L)).toDF("qid", "id", "rn")
    val got = TextAnalysis.rrfFuse(Seq(listA, listB), kRrf = 0, topK = 10)
      .orderBy("rn").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    // id 20 collects 1/2 + 1/1 = 1.5 and overtakes list A's rank-1 item
    assert(got.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L), s"order: ${got.toSeq}")
    assert(got(0)._2 == 1.5 && got(0)._3 == 2L)
    assert(got(1)._2 == 1.0 && got(1)._3 == 1L)
    assert(got(2)._2 == 0.5 && got(3)._2 == 1.0 / 3)
    // equal-score items fall back to the id tie-break
    val tie = Seq((7L, 5L, 1L), (7L, 3L, 1L)).toDF("qid", "id", "rn")
    val t = TextAnalysis.rrfFuse(Seq(tie), kRrf = 60, topK = 2)
      .orderBy("rn").select("id").as[Long].collect().toSeq
    assert(t == Seq(3L, 5L), "rrf ties break by id ascending")
    intercept[IllegalArgumentException](TextAnalysis.rrfFuse(Nil, 60, 5))
    intercept[IllegalArgumentException](TextAnalysis.rrfFuse(Seq(tie), -1, 5))
  }
}
