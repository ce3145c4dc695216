package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Bit-equality of the native one-pass signature expressions with the
  * SQL-composed explode+aggregate pipelines they replace — on a synthetic
  * corpus (incl. the short-doc null edge) and on real fixture documents. */
class NativeHashParitySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy cat again and again today"),
    (3L, "completely different content with no shared trigram shingles here now"),
    (4L, "double  space tokens stay"),   // split keeps the empty token
    (5L, "short doc"),                    // < 3 tokens -> no signature
    (6L, "repeat repeat repeat repeat repeat repeat") // duplicate shingles
  ).toDF("doc_id", "text")

  test("native word_ngrams equals the HOF shingle form (all n, edges included)") {
    import graft.functions.TextOps
    val both = Seq(1, 2, 3, 5).map { n =>
      corpus.select(
        col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), n).as("hof"),
        TextOps.shinglesNative(TextOps.tokens(col("text")), n).as("native"))
        .as[(Long, Seq[String], Seq[String])].collect()
    }
    both.flatten.foreach { case (id, hof, native) =>
      assert(native == hof, s"doc $id diverged")
    }
    // fixture docs too
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val fix = docs.select(
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("hof"),
        TextOps.shinglesNative(TextOps.tokens(col("text")), 3).as("native"))
      .as[(Seq[String], Seq[String])].collect()
    fix.foreach { case (hof, native) => assert(native == hof) }
  }

  test("native top_run equals the interpreted run-length fold (all n, edges, fixtures)") {
    import graft.functions.TextOps
    // the fold top_run replaced (verbatim from the round-10 Gopher gate)
    def hofFold(sortedGrams: org.apache.spark.sql.Column) =
      aggregate(sortedGrams,
        struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"), lit("").as("bg")),
        (acc, g) => {
          val run = when(g === acc("prev"), acc("run") + 1).otherwise(lit(1))
          struct(g.as("prev"), run.as("run"),
            when(run > acc("best"), run).otherwise(acc("best")).as("best"),
            when(run > acc("best"), g).otherwise(acc("bg")).as("bg"))
        })
    val edge = Seq(
      (7L, ""),                       // empty text -> [""] token, "" gram survives
      (8L, "x"),                      // single token, no 2-grams
      (9L, "a a a a"),                // one all-equal run
      (10L, "b a b a b a")            // tie between "a b" and "b a" -> smallest
    ).toDF("doc_id", "text")
    for (df <- Seq(corpus, edge); n <- Seq(2, 3, 4)) {
      val sorted = array_sort(TextOps.shinglesNative(TextOps.tokens(col("text")), n))
      val rows = df.select(col("doc_id"),
          hofFold(sorted).as("h"), graft.plans.GraftFunctions.topRun(sorted).as("t"))
        .select(col("doc_id"),
          col("h")("best").as("hb"), col("h")("bg").as("hg"),
          col("t")("best").as("tb"), col("t")("bg").as("tg"))
        .as[(Long, Int, String, Int, String)].collect()
      rows.foreach { case (id, hb, hg, tb, tg) =>
        assert((tb, tg) == (hb, hg), s"doc $id n=$n: native ($tb,$tg) vs fold ($hb,$hg)")
      }
    }
    // real fixture docs: the exact arrays the q115/q120 gates fold
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    for (n <- Seq(2, 3, 4)) {
      val sorted = array_sort(TextOps.shinglesNative(TextOps.tokens(col("text")), n))
      val diff = docs.select(hofFold(sorted).as("h"),
          graft.plans.GraftFunctions.topRun(sorted).as("t"))
        .filter(col("h")("best") =!= col("t")("best") ||
          col("h")("bg") =!= col("t")("bg")).count()
      assert(diff == 0L, s"n=$n fixture divergence")
    }
  }

  test("word_ngrams tolerates null array elements exactly like concat_ws (no NPE)") {
    import graft.functions.TextOps
    // user-supplied arrays can carry nulls (word_ngrams is a registered SQL
    // function); the HOF form's concat_ws silently skips null elements, so
    // the native loop must produce the identical shingle strings
    val withNulls = Seq(
      (1L, Seq("a", null, "b", "c")),
      (2L, Seq[String](null, null, null)),
      (3L, Seq("x", null))
    ).toDF("doc_id", "toks")
    Seq(1, 2, 3).foreach { n =>
      val rows = withNulls.select(
          col("doc_id"),
          TextOps.shingles(col("toks"), n).as("hof"),
          TextOps.shinglesNative(col("toks"), n).as("native"))
        .as[(Long, Seq[String], Seq[String])].collect()
      rows.foreach { case (id, hof, native) =>
        assert(native == hof, s"doc $id diverged at n=$n: hof=$hof native=$native")
      }
    }
  }

  test("minhash_signature / simhash32 / simhash64 tolerate null array elements (no NPE, parity)") {
    import graft.functions.TextOps
    import graft.plans.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    // the registered SQL functions shingle internally via eachShingle; a
    // null-bearing array must yield the same shingles as the composed
    // explode(word_ngrams) pipeline (concat_ws semantics: nulls skipped),
    // not an NPE and not silently different signatures
    val withNulls = Seq(
      (1L, Seq("a", null, "b", "c", "d")),
      (2L, Seq[String](null, null, null)),
      (3L, Seq("x", "y", null, "x", "y")),
      (4L, Seq("short", null)) // < n tokens -> NULL signature in both forms
    ).toDF("doc_id", "toks")
    val shingleRows = withNulls
      .select(col("doc_id"), explode(TextOps.shingles(col("toks"), 3)).as("w"))
      .distinct()
    val composedSig = Dedup.minHashSignatures(shingleRows, numHashes = 8)
      .as[(Long, Seq[String])].collect().toMap
    val nativeSig = withNulls
      .select(col("doc_id"), GraftFunctions.minHashSignature(col("toks"), 3, 8).as("sig"))
      .filter(col("sig").isNotNull)
      .as[(Long, Seq[String])].collect().toMap
    assert(nativeSig == composedSig)
    assert(!nativeSig.contains(4L), "a doc with < n tokens stays signature-free")
    val composedSh = Dedup.simHash(shingleRows).as[(Long, Long)].collect().toMap
    val nativeSh = withNulls
      .select(col("doc_id"), GraftFunctions.simHash32(col("toks"), 3).as("sh"))
      .filter(col("sh").isNotNull)
      .as[(Long, Long)].collect().toMap
    assert(nativeSh == composedSh)
    // simhash64 has no composed twin at width 64 — the gate here is
    // null-tolerance plus determinism of the skip semantics
    val sh64 = withNulls
      .select(col("doc_id"), GraftFunctions.simHash64(col("toks"), 3).as("sh"))
      .as[(Long, java.lang.Long)].collect().toMap
    assert(sh64(4L) == null)
    assert(sh64(1L) != null && sh64(2L) != null && sh64(3L) != null)
  }

  test("native minhash signatures equal the explode+min pipeline (incl. short-doc drop)") {
    val composed = Dedup.minHashSignatures(
        Dedup.shingleSet(corpus, col("doc_id"), col("text"), 3), numHashes = 8)
      .as[(Long, Seq[String])].collect().toMap
    val native = Dedup.minHashSignaturesNative(corpus, col("doc_id"), col("text"), 3, 8)
      .as[(Long, Seq[String])].collect().toMap
    assert(native == composed)
    assert(!native.contains(5L), "a doc with < n tokens has no signature in either form")
  }

  test("native simhash equals the explode+bit-vote pipeline") {
    val composed = Dedup.simHash(
        Dedup.shingleSet(corpus, col("doc_id"), col("text"), 3))
      .as[(Long, Long)].collect().toMap
    val native = Dedup.simHashNative(corpus, col("doc_id"), col("text"), 3)
      .as[(Long, Long)].collect().toMap
    assert(native == composed)
  }

  test("parity holds on real fixture documents (sf0.001)") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val composedSig = Dedup.minHashSignatures(
        Dedup.shingleSet(docs, col("doc_id"), col("text"), 3), numHashes = 8)
      .as[(Long, Seq[String])].collect().toMap
    val nativeSig = Dedup.minHashSignaturesNative(docs, col("doc_id"), col("text"), 3, 8)
      .as[(Long, Seq[String])].collect().toMap
    assert(nativeSig == composedSig)
    val composedSh = Dedup.simHash(Dedup.shingleSet(docs, col("doc_id"), col("text"), 3))
      .as[(Long, Long)].collect().toMap
    val nativeSh = Dedup.simHashNative(docs, col("doc_id"), col("text"), 3)
      .as[(Long, Long)].collect().toMap
    assert(nativeSh == composedSh)
  }

  test("64-bit simhash banded join equals brute-force N^2 (corpus + fixtures)") {
    for (docs <- Seq(corpus, Tables(spark, "/root/testdata/sf0.001").documents)) {
      val hashes = Dedup.simHash64Native(docs, col("doc_id"), col("text"), 3)
      val h = hashes.as[(Long, Long)].collect().toMap
      val banded = Dedup.simHashNearDups(hashes, maxDist = 3, bits = 64)
        .as[(Long, Long, Long)].collect().toSet
      val brute = (for {
        a <- h.keys; b <- h.keys if a < b
        d = java.lang.Long.bitCount(h(a) ^ h(b)) if d <= 3
      } yield (a, b, d.toLong)).toSet
      assert(banded == brute, s"64-bit pigeonhole banding must have exact recall")
    }
    // a full-width hash actually uses the high bits (sign bit reachable)
    val fixtureHashes = Dedup.simHash64Native(
        Tables(spark, "/root/testdata/sf0.001").documents, col("doc_id"), col("text"), 3)
      .as[(Long, Long)].collect().map(_._2)
    assert(fixtureHashes.exists(h => (h >>> 32) != 0), "high 32 bits must be populated")
  }

  test("SQL registration: the functions are callable from spark.sql") {
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT minhash_signature(split('a b c d', ' '), 3, 4) AS sig,
                simhash32(split('a b c d', ' '), 3) AS sh""").head()
    assert(r.getSeq[String](0).length == 4)
    assert(r.getLong(1) >= 0L && r.getLong(1) <= 0xFFFFFFFFL)
  }
}
