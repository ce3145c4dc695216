package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** [[BpeTrain]] — distributed BPE vocabulary training. Expectations are
  * hand-derived on closed corpora (the Sennrich-style frequency walk). */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges walks the hand-computed merge sequence") {
    // word counts: low×5, lower×2, newest×6, widest×3
    // pair counts r1: es = 6+3 = 9 (newest+widest), st = 9, t end...
    // es vs st tie at 9 -> tie-break "e s" < "s t" -> es first
    val docs = Seq(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, col("text"), 3)
    assert(merges.map(m => (m.rank, m.piece, m.pairCount)) == Seq(
      (1, "es", 9L),   // e+s in newest(6) + widest(3); ties with s+t, wins on pair order
      (2, "est", 9L),  // es+t, now the only 9
      (3, "lo", 7L)    // l+o in low(5) + lower(2)
    ), s"got: ${merges}")
  }

  test("applyMerge pairs runs floor(L/2) times from the left") {
    def run(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("s")
        .select(BpeTrain.applyMerge(col("s"), a, b)).as[Seq[String]].head()
    assert(run(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(run(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(run(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(run(Seq("a", "a", "b"), "a", "b") == Seq("a", "ab"))
    assert(run(Seq("x"), "a", "b") == Seq("x"))
    assert(run(Seq(), "a", "b") == Seq())
  }

  test("learn -> merges file -> registerMerges -> tokenize round-trips") {
    val docs = Seq(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, col("text"), 6)
    val path = java.nio.file.Files.createTempFile("learned-merges", ".txt")
    java.nio.file.Files.writeString(path,
      BpeTrain.pieces(merges).mkString("\n") + "\n")
    graft.plans.BpeVocabs.registerMerges("learned-spec", path)
    // the trained vocab segments its own training words using the
    // learned pieces (greedy longest-match over merges + char fallback)
    val got = Seq(("newest widest low")).toDF("text")
      .select(graft.functions.TextOps.bpeTokensVocab(col("text"), "learned-spec"))
      .as[Seq[String]].head()
    val learned = BpeTrain.pieces(merges).toSet
    assert(got.nonEmpty && got.exists(p => p.length > 1 && learned.contains(p)),
      s"tokenization must use learned multi-char pieces, got $got (vocab $learned)")
    // every emitted piece is either a learned piece or a single-char fallback
    assert(got.forall(p => p.length == 1 || learned.contains(p)), s"got $got")
  }

  test("training is deterministic across partitionings (ties broken by pair order)") {
    val docs = Seq.tabulate(40)(i => (i.toLong, "abba abab baab")).toDF("doc_id", "text")
    val a = BpeTrain.learnMerges(docs.repartition(1), col("text"), 4)
    val b = BpeTrain.learnMerges(docs.repartition(7), col("text"), 4)
    assert(a == b, s"$a vs $b")
  }

  /** The batched trainer's contract is EXACT sequence equality with the
    * per-merge trainer — the speedup must never buy a different vocab. */
  private def assertBatchedEquals(docs: org.apache.spark.sql.DataFrame,
      k: Int, batch: Int, clue: String): Int = {
    var rounds = 0
    val seq = BpeTrain.learnMerges(docs, col("text"), k)
    val bat = BpeTrain.learnMergesBatched(docs, col("text"), k, batch = batch,
      onRound = (_, _, _) => rounds += 1)
    assert(bat == seq, s"$clue: batched $bat vs sequential $seq")
    rounds
  }

  test("batched selection reproduces the sequential sequence on the Sennrich corpus") {
    val docs = Seq(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    assertBatchedEquals(docs, 6, batch = 8, "sennrich")
  }

  test("batched selection survives runs, ties and alternations") {
    // runs of one symbol (floor(L/2) pairing), abab alternation (created
    // pairs tie with surviving ones), and heavy count ties
    val docs = Seq(
      (1L, "aaaa aaa aaaaaa"), (2L, ("abab " * 8).trim),
      (3L, ("bb " * 8).trim), (4L, "abba baab abab aabb")
    ).toDF("doc_id", "text")
    assertBatchedEquals(docs, 8, batch = 8, "runs+ties")
  }

  test("batched selection survives a piece-string collision") {
    // 'xy'+'z' and 'x'+'yz' both concatenate to "xyz": once one is
    // learned, the other's merge COLLIDES with the existing symbol
    // string, which must close the round (invariant 3), never reorder
    val docs = Seq(
      (1L, ("xy xy xy xy xy " * 4).trim), (2L, ("yz yz yz yz " * 3).trim),
      (3L, ("xyz xyz xyz " * 5).trim), (4L, "x y z zy yx")
    ).toDF("doc_id", "text")
    assertBatchedEquals(docs, 10, batch = 8, "collision")
  }

  test("batched == sequential on randomized small-alphabet corpora (property sweep)") {
    // tiny alphabets maximize interaction density: every hazard class
    // (overlap chains, created-pair overtakes, collisions) occurs with
    // high probability somewhere in the sweep. Seeded: reproducible.
    val rnd = new scala.util.Random(421202L)
    for (trial <- 1 to 6) {
      val sigma = "ab".length + rnd.nextInt(3) // alphabet size 2-4
      val batch = 2 + rnd.nextInt(8)           // vary batching pressure too
      val docs = Seq.tabulate(30) { i =>
        val words = Seq.fill(3 + rnd.nextInt(5)) {
          Seq.fill(1 + rnd.nextInt(7))(('a' + rnd.nextInt(sigma)).toChar).mkString
        }
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      assertBatchedEquals(docs, 12, batch = batch, s"trial$trial(batch=$batch)")
    }
  }

  test("batched training resumes from a checkpointed prefix to the identical sequence") {
    val docs = Seq(
      (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim)
    ).toDF("doc_id", "text")
    val full = BpeTrain.learnMergesBatched(docs, col("text"), 8)
    assert(full.size == 8, s"fixture must support 8 merges, got $full")
    // resume mid-train; result must include the prefix and equal the
    // unresumed sequence merge for merge
    val resumed = BpeTrain.learnMergesBatched(docs, col("text"), 8,
      resumeFrom = full.take(3))
    assert(resumed == full, s"resumed $resumed vs full $full")
    // a prefix CROSSING the lineage-truncation boundary replays through
    // a localCheckpoint and must still land on the same continuation
    val resumed2 = BpeTrain.learnMergesBatched(docs, col("text"), 8,
      truncateEvery = 2, resumeFrom = full.take(5))
    assert(resumed2 == full, s"checkpoint-crossing resume $resumed2 vs $full")
    // guardrails: non-contiguous prefix and already-complete prefix throw
    intercept[IllegalArgumentException] {
      BpeTrain.learnMergesBatched(docs, col("text"), 8, resumeFrom = full.drop(1))
    }
    intercept[IllegalArgumentException] {
      BpeTrain.learnMergesBatched(docs, col("text"), 8, resumeFrom = full)
    }
  }

  test("batched training accepts multi-merge rounds on a Zipfian corpus") {
    // disjoint-alphabet frequent pairs with well-separated counts: the
    // acceptance walk should clear several merges per snapshot — the
    // whole point of the batch path. Gate the measured round count.
    val docs = Seq.tabulate(60) { i =>
      val t = Seq.fill(20)("lo") ++ Seq.fill(12)("me") ++ Seq.fill(7)("xy") ++
        Seq.fill(4)("qr") ++ Seq.fill(2)("vw")
      (i.toLong, t.mkString(" "))
    }.toDF("doc_id", "text")
    val rounds = assertBatchedEquals(docs, 5, batch = 8, "zipf")
    assert(rounds < 5, s"expected batching (<5 rounds for 5 merges), got $rounds")
  }
}
