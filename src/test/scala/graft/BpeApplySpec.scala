package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain
import graft.plans.{BpeMergeRanks, GraftFunctions}

/** [[graft.plans.BpeApplyMerges]] — merge-order BPE inference. The load-
  * bearing property: rank-order replay (always merge the lowest-rank
  * adjacent pair) must equal applying the merges ONE BY ONE in learning
  * order via [[BpeTrain.applyMerge]] — on training words and on unseen
  * words alike — because a pair's symbols only exist once their own
  * strictly-earlier merges have fired. */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim)
  ).toDF("doc_id", "text")

  private lazy val merges = BpeTrain.learnMerges(corpus, col("text"), 6)

  private def sequential(word: String): Seq[String] = {
    // fold the merges in rank order through the trainer's own applier
    val chars = word.map(_.toString)
    val colExpr = merges.foldLeft(
      array(chars.map(lit): _*).cast("array<string>")) {
      (c, m) => BpeTrain.applyMerge(c, m.a, m.b)
    }
    Seq(1).toDF("x").select(colExpr).as[Seq[String]].head()
  }

  private def viaExpr(text: String, id: String): Seq[String] =
    Seq(text).toDF("t")
      .select(GraftFunctions.bpeApplyMerges(col("t"), id)).as[Seq[String]].head()

  test("rank-order inference equals sequential merge replay, training and unseen words") {
    BpeMergeRanks.register("apply-spec", merges.map(m => (m.a, m.b)))
    val words = Seq("low", "lower", "newest", "widest",    // training
      "lowest", "wide", "news", "sew", "zzz", "w")          // unseen
    words.foreach { w =>
      assert(viaExpr(w, "apply-spec") == sequential(w), s"word '$w'")
    }
  }

  test("doc semantics: lowercase, space split, empty words skipped, order kept") {
    BpeMergeRanks.register("apply-spec2", merges.map(m => (m.a, m.b)))
    val got = viaExpr("Newest  LOW", "apply-spec2")
    assert(got == sequential("newest") ++ sequential("low"), s"got $got")
  }

  test("symbols outside the vocab pass through as single chars; unregistered id is loud") {
    BpeMergeRanks.register("apply-spec3", Seq())
    assert(viaExpr("abc", "apply-spec3") == Seq("a", "b", "c"))
    val e = intercept[Exception] { viaExpr("abc", "never-registered") }
    assert(e.getMessage.contains("never-registered"))
  }

  test("file-backed merge-rank vocab round-trips and segments identically") {
    BpeMergeRanks.register("apply-mem", merges.map(m => (m.a, m.b)))
    val path = java.nio.file.Files.createTempFile("merge-ranks", ".txt")
    BpeMergeRanks.writeFile(path, merges.map(m => (m.a, m.b)))
    BpeMergeRanks.registerFile("apply-file", path)
    for (w <- Seq("newest", "lowest", "widest sew"))
      assert(viaExpr(w, "apply-file") == viaExpr(w, "apply-mem"), s"'$w'")
    // re-registration serves the NEW vocab, never a stale resolved map
    BpeMergeRanks.register("apply-file", Seq())
    assert(viaExpr("newest", "apply-file") ==
      Seq("n", "e", "w", "e", "s", "t"))
  }

  test("longest-match (WordPiece-style) and merge-order can legitimately differ") {
    // vocab pieces {ab, bc, abc? no}: merges (b,c) rank0, (a,b) rank1.
    // merge-order on "abc": (b,c) first -> [a, bc].
    // greedy longest-match over pieces {bc, ab} on "abc": "ab" matches
    // at position 0 first -> [ab, c]. Both are real tokenizer
    // conventions; this pins WHY both surfaces exist.
    BpeMergeRanks.register("apply-diff", Seq(("b", "c"), ("a", "b")))
    assert(viaExpr("abc", "apply-diff") == Seq("a", "bc"))
    val path = java.nio.file.Files.createTempFile("diff-pieces", ".txt")
    java.nio.file.Files.writeString(path, "bc\nab\n")
    graft.plans.BpeVocabs.registerMerges("apply-diff-lm", path)
    val lm = Seq("abc").toDF("t")
      .select(graft.functions.TextOps.bpeTokensVocab(col("t"), "apply-diff-lm"))
      .as[Seq[String]].head()
    assert(lm == Seq("ab", "c"), s"longest-match got $lm")
  }
}
