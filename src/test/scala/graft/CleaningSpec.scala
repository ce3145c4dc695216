package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.Cleaning

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText: case, punctuation, whitespace runs") {
    val got = Seq("  Hello,   WORLD!! 42\tfoo_bar  ")
      .toDF("t").select(TextOps.normalizeText(col("t"))).as[String].head()
    assert(got == "hello world 42 foo bar")
  }

  test("removeStopwords filters without explode") {
    val got = Seq(Seq("the", "quick", "fox", "the")).toDF("toks")
      .select(TextOps.removeStopwords(col("toks"), Seq("the", "a"))).as[Seq[String]].head()
    assert(got == Seq("quick", "fox"))
  }

  test("clean keeps good docs, rejects degenerate ones, quarantine is the complement") {
    val docs = Seq(
      (1L, "a genuinely reasonable document with several distinct tokens present here"),
      (2L, "x x x x x x x x x x x x x x x x x x x x"),  // TTR 1/20 too low
      (3L, "too short"),                                 // under minTokens
      (4L, "Supercalifragilisticexpialidocious Pneumonoultramicroscopicsilicovolcanoconiosis " * 5)
    ).toDF("doc_id", "text")
    val kept = Cleaning.clean(docs, col("text")).select("doc_id").as[Long].collect().toSet
    val rej = Cleaning.rejected(docs, col("text")).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"only the reasonable doc passes, got $kept")
    assert(rej == Set(2L, 3L, 4L))
    assert((kept ++ rej) == Set(1L, 2L, 3L, 4L))
  }

  test("stripMarkup removes tags and collapses the leftover whitespace") {
    val got = Seq("""<p class="x">hello <b>world</b></p> <br/> done""")
      .toDF("t").select(Cleaning.stripMarkup(col("t"))).as[String].head()
    assert(got == "hello world done")
  }

  test("redactPii replaces emails and phone-like groups, leaves the rest") {
    val got = Seq("write a.user+tag@sub.example.org or call 555-0175 x 12-34")
      .toDF("t").select(Cleaning.redactPii(col("t"))).as[String].head()
    assert(got == "write [EMAIL] or call [PHONE] x 12-34")
  }

  test("fixture corpus mostly passes the default gate") {
    val total = sf0001.documents.count()
    val kept = Cleaning.clean(sf0001.documents, col("text")).count()
    assert(kept > total * 0.9, s"expected >90% of synthetic docs to pass, got $kept/$total")
  }

  test("quantileGate keeps exactly the at-or-above-quantile rows, ties included") {
    // scores 1..8: p75 over n=8 is 6.25 (interpolated) -> keep {7, 8};
    // with a tie AT an exact-order-stat quantile the tied rows all stay
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val kept = Cleaning.quantileGate(df, col("s"), 0.75)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(7L, 8L), s"got $kept")
    // n=5 scores (1,2,3,3,9): p50 = 3 exactly -> both 3s kept
    val tied = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 3.0), (5L, 9.0))
      .toDF("id", "s")
    val keptTied = Cleaning.quantileGate(tied, col("s"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(keptTied == Set(3L, 4L, 5L), s"ties at the threshold must stay: $keptTied")
    // schema passes through unchanged (no working column leaks)
    assert(Cleaning.quantileGate(df, col("s"), 0.75).columns.toSeq == Seq("id", "s"))
    val e = intercept[IllegalArgumentException](Cleaning.quantileGate(df, col("s"), 1.0))
    assert(e.getMessage.contains("quantile"))
  }

  test("gopherRules: each rule gates independently; metrics are closed-form") {
    val docs = Seq(
      // 1: healthy — 16 words, stopwords present, varied bigrams
      (1L, "the quick brown fox jumps over a lazy dog while the cat walks to town today"),
      // 2: too short (< 15 words)
      (2L, "the a short doc of to in here"),
      // 3: no stopwords
      (3L, "quick brown fox jumps runs walks sits stands eats drinks sleeps wakes looks turns moves"),
      // 4: degenerate repetition -> top-2-gram fraction blows the ceiling
      (4L, "spam ham spam ham spam ham spam ham spam ham spam ham spam ham the a")
    ).toDF("id", "text")
    val out = Cleaning.gopherRules(docs, col("id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("keep") && out(2L).getAs[Long]("n_words") == 8L)
    assert(!out(3L).getAs[Boolean]("keep") && out(3L).getAs[Long]("stop_hits") == 0L)
    assert(!out(4L).getAs[Boolean]("keep"))
    // doc 4 closed-form: "spam ham" occurs 7x, "ham spam" 6x -> top gram
    // (count desc, lex asc tie-break) = "spam ham", 7 * len("spam ham")
    // chars over the doc's char count
    val text4 = "spam ham spam ham spam ham spam ham spam ham spam ham spam ham the a"
    val t4 = out(4L).getAs[Double]("top2_frac")
    assert(math.abs(t4 - 7.0 * 8 / text4.length) < 1e-12, s"got $t4")
    // doc 1 mean word length: 62 alpha chars over 16 words
    val docText = "the quick brown fox jumps over a lazy dog while the cat walks to town today"
    val words = docText.split(" ")
    val want = words.map(_.length).sum.toDouble / words.length
    assert(math.abs(out(1L).getAs[Double]("mean_word_len") - want) < 1e-12)
  }

  test("gopherRules: single-word doc has top2_frac 0 and fails the word floor") {
    val one = Seq((9L, "word")).toDF("id", "text")
    val r = Cleaning.gopherRules(one, col("id"), col("text")).collect()(0)
    assert(r.getAs[Double]("top2_frac") == 0.0 && !r.getAs[Boolean]("keep"))
  }

  test("gopherRulesFull: dup line/paragraph fractions and top-3/4-gram are closed-form") {
    // lines: [aa bb, aa bb, cc dd, ee ff, gg hh] (the blank paragraph
    // separator filtered) -> 1 dup occurrence of 5 = 0.2; paragraphs
    // distinct -> 0. nch = 30 incl newlines.
    val text1 = "aa bb\naa bb\ncc dd\n\nee ff\ngg hh"
    // paragraphs: [x y, x y] -> dup_para_frac 0.5
    val text2 = "x y\n\nx y"
    val out = Cleaning.gopherRulesFull(
        Seq((1L, text1), (2L, text2)).toDF("id", "text"), col("id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 10L)
    assert(r1.getAs[Double]("mean_word_len") == 2.0)
    assert(r1.getAs[Long]("n_lines") == 5L)
    assert(math.abs(r1.getAs[Double]("dup_line_frac") - 0.2) < 1e-12)
    assert(r1.getAs[Long]("n_paras") == 2L)
    assert(r1.getAs[Double]("dup_para_frac") == 0.0)
    assert(text1.length == 30)
    // "aa bb" occurs twice (5 chars); every 3-gram and 4-gram is unique so
    // the argmax is the lexicographically smallest ("aa bb aa" / "aa bb aa bb")
    assert(math.abs(r1.getAs[Double]("top2_frac") - 2.0 * 5 / 30) < 1e-12)
    assert(math.abs(r1.getAs[Double]("top3_frac") - 8.0 / 30) < 1e-12)
    assert(math.abs(r1.getAs[Double]("top4_frac") - 11.0 / 30) < 1e-12)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_paras") == 2L)
    assert(math.abs(r2.getAs[Double]("dup_para_frac") - 0.5) < 1e-12)
    assert(r2.getAs[Long]("n_lines") == 2L &&
      math.abs(r2.getAs[Double]("dup_line_frac") - 0.5) < 1e-12)
    // paragraph-duplicated short doc fails (word floor + dup rules)
    assert(!r2.getAs[Boolean]("keep"))
  }

  test("gopherRulesFull: newline-free text matches gopherRules on the shared metrics") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog while the cat walks to town today"),
      (4L, "spam ham spam ham spam ham spam ham spam ham spam ham spam ham the a")
    ).toDF("id", "text")
    val base = Cleaning.gopherRules(docs, col("id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val full = Cleaning.gopherRulesFull(docs, col("id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    for (id <- Seq(1L, 4L); c <- Seq("n_words", "mean_word_len", "stop_hits", "top2_frac"))
      assert(base(id).getAs[Any](c) == full(id).getAs[Any](c), s"$c for $id")
    // single line, single paragraph, nothing duplicated
    assert(full(1L).getAs[Long]("n_lines") == 1L &&
      full(1L).getAs[Double]("dup_line_frac") == 0.0 &&
      full(1L).getAs[Long]("n_paras") == 1L &&
      full(1L).getAs[Double]("dup_para_frac") == 0.0)
  }

  test("canonicalizeUrl: case, www, default ports, junk params, fragment, trailing slash") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(Cleaning.canonicalizeUrl(col("u"))).as[String].head()
    // the full gauntlet collapses to the canonical form
    assert(canon("HTTPS://WWW.Site.Example.ORG:443/a/b/?utm_source=x&ref=keep&gclid=123#sec") ==
      "https://site.example.org/a/b/?ref=keep")
    assert(canon("http://www.site.example.org:80/a") == "http://site.example.org/a")
    // non-default port, param order, real params all survive
    assert(canon("https://site.example.org:8443/a?b=2&a=1") ==
      "https://site.example.org:8443/a?b=2&a=1")
    // junk-only query disappears entirely; bare root slash drops
    assert(canon("https://site.example.org/?utm_medium=mail&utm_term=x") ==
      "https://site.example.org")
    // leading junk param before a kept one re-anchors the '?'
    assert(canon("https://x.org/p?fbclid=abc&q=1") == "https://x.org/p?q=1")
    // no scheme -> trimmed passthrough (no base to resolve against)
    assert(canon("  example.org/path  ") == "example.org/path")
  }

  test("piiScrub: per-category counts and typed masks, all categories at once") {
    val r = Cleaning.piiScrub(
      Seq((1L, "mail a.u+x@sub.example.org then ssh 192.168.1.17 or dial 555-012-3456 twice 555-012-3456"))
        .toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect()(0)
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_ips") == 1L)
    assert(r.getAs[Long]("n_phones") == 2L)
    assert(r.getAs[String]("text_redacted") ==
      "mail [EMAIL] then ssh [IP] or dial [PHONE] twice [PHONE]")
  }

  test("piiScrub: email digits never double-count as phone or IP fragments") {
    // the local part and domain contain an IP-shaped and a phone-shaped
    // digit run; masking emails FIRST must make both invisible
    val r = Cleaning.piiScrub(
      Seq((1L, "u555-012-3456@10.0.0.7x.example.com stays otherwise clean")).toDF("id", "t"),
      col("id"), col("t")).collect()(0)
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_ips") == 0L, "IP inside a masked email must not count")
    assert(r.getAs[Long]("n_phones") == 0L, "phone inside a masked email must not count")
    assert(r.getAs[String]("text_redacted") == "[EMAIL] stays otherwise clean")
  }

  test("piiScrub: NULL text propagates as NULL counts and NULL redaction (SQL semantics)") {
    val r = Cleaning.piiScrub(
      Seq((1L, Option.empty[String])).toDF("id", "t"), col("id"), col("t")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("n_emails")) && r.isNullAt(r.fieldIndex("n_ips")) &&
      r.isNullAt(r.fieldIndex("n_phones")) && r.isNullAt(r.fieldIndex("text_redacted")))
  }

  test("piiScrubFull: all six categories at once, typed masks and counts") {
    val r = Cleaning.piiScrubFull(
      Seq((1L, "mail a@ex.org pay DE89370400440532013000 now card 4539 1488 0343 6467 ok " +
        "ssh 10.0.0.7 ssn 123-45-6789 dial 555-012-3456")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect()(0)
    assert(r.getAs[Long]("n_emails") == 1L && r.getAs[Long]("n_cards") == 1L &&
      r.getAs[Long]("n_ibans") == 1L && r.getAs[Long]("n_ips") == 1L &&
      r.getAs[Long]("n_ssns") == 1L && r.getAs[Long]("n_phones") == 1L, s"$r")
    assert(r.getAs[String]("text_redacted") ==
      "mail [EMAIL] pay [IBAN] now card [CARD] ok ssh [IP] ssn [SSN] dial [PHONE]")
  }

  test("piiScrubFull: only Luhn-VALID card runs mask, across separators and lengths") {
    val cases = Seq(
      ("4539 1488 0343 6467", true),  // spaced visa, valid
      ("4539 1488 0343 6468", false), // check digit broken
      ("6011-0009-9013-9424", true),  // dashed discover
      ("340000000000009", true),      // bare amex (15 digits)
      ("340000000000000", false),
      ("1234567890", false),          // 10 digits: below PAN range
      ("12345678901234567890", false) // 20 digits: above PAN range
    )
    cases.zipWithIndex.foreach { case ((card, valid), i) =>
      val r = Cleaning.piiScrubFull(
        Seq((i.toLong, s"num $card end")).toDF("id", "t"), col("id"), col("t"))
        .collect()(0)
      assert(r.getAs[Long]("n_cards") == (if (valid) 1L else 0L), s"$card: $r")
      assert(r.getAs[String]("text_redacted") ==
        (if (valid) "num [CARD] end" else s"num $card end"), s"$card: $r")
    }
  }

  test("luhn scanner vs an independent group-aligned sub-span model (property sweep)") {
    // generate random 13-19-digit numbers, inject with random space/dash
    // grouping, and check the native scanner against an INDEPENDENTLY
    // written model of its documented semantics (regex tokenization +
    // string slicing instead of the byte-level scan): within each digit
    // run, search contiguous GROUP subsequences — start left-to-right,
    // end longest-first — for a Luhn-valid 13-19-digit span; mask it,
    // resume after it. Two properties fall out and are asserted:
    //  1. scanner output ≡ model output (mask text AND count), and
    //  2. a Luhn-VALID full run always masks whole as one [CARD] (the
    //     longest span from start 0 IS the run) — the old all-or-nothing
    //     sweep's positive direction, preserved.
    // Invalid full runs MAY legitimately mask a group-aligned sub-span
    // (~1-in-10 per eligible span): that recall-over-precision trade is
    // the r13 semantics decision, adversarially pinned in LuhnCardsSpec.
    def refLuhn(ds: String): Boolean = {
      // forward pass: double every digit at even distance from the END-1
      val n = ds.length
      var sum = 0
      for (i <- 0 until n) {
        val d0 = ds.charAt(i) - '0'
        val d = if ((n - 1 - i) % 2 == 1) d0 * 2 else d0
        sum += (if (d > 9) d - 9 else d)
      }
      sum % 10 == 0
    }
    def modelRun(run: String): (String, Int) = {
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var s = 0
      for (k <- 0 until run.length)
        if (!run.charAt(k).isDigit) { bounds += ((s, k)); s = k + 1 }
      bounds += ((s, run.length))
      val g = bounds.length
      def spanDigits(a: Int, b: Int): String =
        (a to b).map { k => run.substring(bounds(k)._1, bounds(k)._2) }.mkString
      val sb = new StringBuilder
      var emitted = 0
      var count = 0
      var s0 = 0
      while (s0 < g) {
        ((g - 1) to s0 by -1).find { e0 =>
          val ds = spanDigits(s0, e0)
          ds.length >= 13 && ds.length <= 19 && refLuhn(ds)
        } match {
          case Some(e0) =>
            count += 1
            sb.append(run.substring(emitted, bounds(s0)._1)).append("[CARD]")
            emitted = bounds(e0)._2
            s0 = e0 + 1
          case None => s0 += 1
        }
      }
      sb.append(run.substring(emitted))
      (sb.toString, count)
    }
    def modelText(text: String): (String, Int) = {
      val re = "[0-9]+(?:[ -][0-9]+)*".r
      var count = 0
      val sb = new StringBuilder
      var last = 0
      re.findAllMatchIn(text).foreach { m =>
        val (masked, n) = modelRun(m.matched)
        sb.append(text.substring(last, m.start)).append(masked)
        count += n
        last = m.end
      }
      sb.append(text.substring(last))
      (sb.toString, count)
    }
    val rnd = new scala.util.Random(1202L)
    val cases = (1 to 40).map { i =>
      val len = 13 + rnd.nextInt(7)
      val ds = Seq.fill(len)(('0' + rnd.nextInt(10)).toChar).mkString
      // random grouping with single separators
      val grouped = ds.grouped(1 + rnd.nextInt(5)).mkString(
        if (rnd.nextBoolean()) " " else "-")
      (i.toLong, s"pay $grouped today", refLuhn(ds))
    }
    val got = Cleaning.piiScrubFull(
        cases.map { case (id, t, _) => (id, t) }.toDF("id", "t"), col("id"), col("t"))
      .select("id", "n_cards", "text_redacted").as[(Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    cases.foreach { case (id, t, valid) =>
      val (n, masked) = got(id)
      val (wantMasked, wantN) = modelText(t)
      assert(n == wantN.toLong && masked == wantMasked,
        s"id $id '$t': got ($n, $masked) want ($wantN, $wantMasked)")
      if (valid) // property 2: a valid full run always masks whole
        assert(masked == "pay [CARD] today" && n == 1L, s"id $id: $masked")
    }
  }

  test("piiScrubFull: an IBAN's 20-digit tail is neither a card nor anything else") {
    // card masking runs BEFORE the IBAN mask sees the text: the 20-digit
    // run must be rejected by the PAN length gate, then masked as [IBAN]
    val r = Cleaning.piiScrubFull(
      Seq((1L, "send to DE89370400440532013000 please")).toDF("id", "t"),
      col("id"), col("t")).collect()(0)
    assert(r.getAs[Long]("n_cards") == 0L && r.getAs[Long]("n_ibans") == 1L, s"$r")
    assert(r.getAs[String]("text_redacted") == "send to [IBAN] please")
  }

  test("piiScrubFull: masked categories never re-match downstream; NULL propagates") {
    // an email whose local part is a VALID card number: the email mask
    // runs first, so the card counter must see nothing
    val r = Cleaning.piiScrubFull(
      Seq((1L, "4539148803436467@ex.org wrote")).toDF("id", "t"),
      col("id"), col("t")).collect()(0)
    assert(r.getAs[Long]("n_emails") == 1L && r.getAs[Long]("n_cards") == 0L, s"$r")
    assert(r.getAs[String]("text_redacted") == "[EMAIL] wrote")
    val n = Cleaning.piiScrubFull(
      Seq((1L, Option.empty[String])).toDF("id", "t"), col("id"), col("t")).collect()(0)
    assert(n.isNullAt(n.fieldIndex("n_cards")) && n.isNullAt(n.fieldIndex("n_ibans")) &&
      n.isNullAt(n.fieldIndex("n_ssns")) && n.isNullAt(n.fieldIndex("text_redacted")))
  }

  test("luhn card expressions participate in whole-stage codegen (UnsafeProjection compiles)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.unsafe.types.UTF8String
    val in = BoundReference(0, org.apache.spark.sql.types.StringType, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.plans.LuhnMaskCards(in), graft.plans.LuhnCountCards(in)))
    val out = proj(InternalRow(UTF8String.fromString("x 4539 1488 0343 6467 y")))
    assert(out.getUTF8String(0).toString == "x [CARD] y" && out.getInt(1) == 1)
    assert(proj(InternalRow(null)).isNullAt(0))
  }

  test("piiScrubFull is a stateless projection: stream/batch parity") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("docs-pii-full")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val injected = concat(col("text"),
      when(col("doc_id") % 2 === 0, lit(" card 4539 1488 0343 6467 ssn 123-45-6789"))
        .otherwise(lit(" card 4539 1488 0343 6468 pay DE89370400440532013000 x")))
    def key(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("id") -> (r.getAs[Long]("n_cards"), r.getAs[Long]("n_ibans"),
        r.getAs[Long]("n_ssns"), r.getAs[String]("text_redacted"))
    val docsStream = spark.readStream.schema(Tables.schemas("documents"))
      .parquet(dir.toString).select(col("doc_id"), injected.as("text"))
    val q = Cleaning.piiScrubFull(docsStream, col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("pii_full_s")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("pii_full_s").collect().map(key).toMap
    val batchDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), injected.as("text"))
    val batch = Cleaning.piiScrubFull(batchDocs, col("doc_id"), col("text"))
      .collect().map(key).toMap
    assert(streamed.nonEmpty && streamed == batch,
      "streamed scrub must equal the batch scrub row for row")
  }

  test("piiScrub: clean text passes through untouched with zero counts") {
    val r = Cleaning.piiScrub(
      Seq((1L, "version 1.2 of chapter 555 has no contact details")).toDF("id", "t"),
      col("id"), col("t")).collect()(0)
    assert(r.getAs[Long]("n_emails") == 0L && r.getAs[Long]("n_ips") == 0L &&
      r.getAs[Long]("n_phones") == 0L)
    assert(r.getAs[String]("text_redacted") ==
      "version 1.2 of chapter 555 has no contact details")
  }

  test("ccnetBuckets: per-group terciles on a closed fixture, CCNet keep = head+middle") {
    // lang a: scores 1..9 — terciles land ON data points (pos = (9-1)/3
    // is an integer rank), t1 = 3.666…, t2 = 6.333…: head {1,2,3},
    // middle {4,5,6}, tail {7,8,9}. lang b: shifted by 100 — its OWN
    // thresholds, proving group isolation (under a's they'd all be tail).
    val rows = (1 to 9).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 3).map(i => ("b", 100L + i, 100.0 + i))
    val got = Cleaning.ccnetBuckets(
        rows.toDF("lang", "id", "s").repartition(4), col("lang"), col("s"))
      .select("lang", "id", "bucket", "keep")
      .as[(String, Long, String, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert((1 to 3).forall(i => got(("a", i.toLong)) == (("head", true))))
    assert((4 to 6).forall(i => got(("a", i.toLong)) == (("middle", true))))
    assert((7 to 9).forall(i => got(("a", i.toLong)) == (("tail", false))))
    // b's three scores split into its own terciles: 101 head, 102 middle,
    // 103 tail — nothing leaked from a's distribution
    assert(got(("b", 101L)) == (("head", true)))
    assert(got(("b", 102L)) == (("middle", true)))
    assert(got(("b", 103L)) == (("tail", false)))
  }

  test("ccnetBuckets: NULL scores bucket NULL and are never kept") {
    val rows = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)),
      ("a", 3L, Some(3.0)), ("a", 4L, Option.empty[Double]))
    val got = Cleaning.ccnetBuckets(rows.toDF("g", "id", "s"), col("g"), col("s"))
      .select("id", "bucket", "keep")
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[String]("bucket")), r.getAs[Boolean]("keep")))).toMap
    assert(got(4L) == ((None, false)))
    assert(got(1L)._1.contains("head"))
    intercept[IllegalArgumentException] {
      Cleaning.ccnetBuckets(rows.toDF("g", "id", "s"), col("g"), col("s"),
        qLow = 0.5, qHigh = 0.4)
    }
  }

  test("ccnetBuckets: NULL-group docs bucket NULL (keep=false), groups unaffected") {
    // a NULL group has no per-language distribution to bucket against:
    // the equi-join misses (NULL never equals), the threshold columns
    // come back NULL, and the doc must take a NULL bucket — NOT a
    // confident 'tail' off `score <= NULL` falling through to otherwise.
    // The null-group scores (0.5 and 9.5) are chosen to bracket lang a's
    // distribution: under a's thresholds they'd read 'head' and 'tail'.
    val rows = Seq(
      (Option("a"), 1L, 1.0), (Option("a"), 2L, 2.0), (Option("a"), 3L, 3.0),
      (Option.empty[String], 10L, 0.5), (Option.empty[String], 11L, 9.5))
    val got = Cleaning.ccnetBuckets(rows.toDF("g", "id", "s"), col("g"), col("s"))
      .select("id", "bucket", "keep")
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[String]("bucket")), r.getAs[Boolean]("keep")))).toMap
    assert(got.size == 5, s"null-group rows duplicated or dropped: $got")
    assert(got(10L) == ((None, false)) && got(11L) == ((None, false)), s"$got")
    assert(got(1L) == ((Some("head"), true)) && got(3L) == ((Some("tail"), false)),
      s"non-null group disturbed: $got")
  }

  test("benfordAudit: exact digit census, chi-square recomputed, guards on empty/non-positive") {
    // digits: 1 (from 1, 19), 2 (from 23, 2), 9 (from 911); 0/-5/NULL excluded
    val df = Seq(Some(1L), Some(19L), Some(23L), Some(2L), Some(911L),
      Some(0L), Some(-5L), None).toDF("x")
    val got = Cleaning.benfordAudit(df, col("x"))
      .orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 9L), "all 9 spine digits present")
    val obs = got.map(g => g._1 -> g._2).toMap
    assert(obs == Map(1L -> 2L, 2L -> 2L, 9L -> 1L) ++
      Seq(3L, 4L, 5L, 6L, 7L, 8L).map(_ -> 0L).toMap, s"census: $obs")
    // expectation and term recomputed independently (n = 5 positives)
    got.foreach { case (d, o, ef, term) =>
      val expF = math.log10(1.0 + 1.0 / d)
      assert(math.abs(ef - expF) < 1e-12, s"digit $d expectation")
      val e = expF * 5
      assert(math.abs(term - (o - e) * (o - e) / e) < 1e-9, s"digit $d term")
    }
    // the observed column sums back to the positive count (mass check)
    assert(got.map(_._2).sum == 5L)
    // empty positive set fails AT EXECUTION (the operator stays lazy:
    // building the frame launches no job), with the named reason
    val empty = Cleaning.benfordAudit(Seq(0L, -1L).toDF("x"), col("x"))
    val ex = intercept[Exception](empty.collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}|${msgs(t.getCause)}"
    assert(msgs(ex).contains("no positive integer magnitudes"), msgs(ex).take(300))
  }

  test("benfordSignificant: mantissa digits across magnitudes, incl. the sub-unit and ulp-boundary cases") {
    // the cases the integer-part variant gets wrong or excludes:
    // 0.005 → 5 (sub-unit), 0.04 → 4 (computed mantissa is
    // 3.99999999999999x — the 1e-9 grid snap must rescue it),
    // 901.37 → 9, 1000 → 1 (log10(1000) can land an ulp below 3 —
    // the correction step must absorb it), 0.1 → 1, 7 → 7;
    // 0, -3.2 and NULL excluded
    val df = Seq(Some(0.005), Some(0.04), Some(901.37), Some(1000.0),
      Some(0.1), Some(7.0), Some(0.0), Some(-3.2), None).toDF("x")
    val got = Cleaning.benfordSignificant(df, col("x"))
      .orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 9L), "all 9 spine digits present")
    val obs = got.map(g => g._1 -> g._2).toMap
    assert(obs == Map(1L -> 2L, 4L -> 1L, 5L -> 1L, 7L -> 1L, 9L -> 1L) ++
      Seq(2L, 3L, 6L, 8L).map(_ -> 0L).toMap, s"census: $obs")
    // the chi-square machinery is shared with benfordAudit; re-pin one term
    val n = got.map(_._2).sum
    assert(n == 6L)
    got.foreach { case (d, o, ef, term) =>
      val e = math.log10(1.0 + 1.0 / d) * n
      assert(math.abs(term - (o - e) * (o - e) / e) < 1e-9, s"digit $d term")
    }
    // wide-magnitude sweep: the normalized digit always equals the first
    // significant digit of the exact decimal value under the SAME 1e-9
    // grid contract — i.e. after rounding the exact mantissa to 10
    // significant digits (round(m·1e9) ≡ a 10-sig-digit HALF_UP round
    // for m in [1,10)). The snap is the point: 6e-11 stores as
    // 5.9999999999999997e-11 and must audit as the digit 6 the decimal
    // author wrote, not the representation artifact 5.
    val sweep = (1 to 300).map(i => math.pow(1.7, i % 60) * 1e-12 * i)
    val sdf = sweep.toDF("x")
    val census = Cleaning.benfordSignificant(sdf, col("x"))
      .select("digit", "obs").as[(Long, Long)].collect().toMap
    val mc10 = new java.math.MathContext(10, java.math.RoundingMode.HALF_UP)
    val expected = sweep
      .map(v => new java.math.BigDecimal(v).round(mc10)
        .unscaledValue.toString.dropWhile(_ == '0').head.toString.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    (1L to 9L).foreach { d =>
      assert(census.getOrElse(d, 0L) == expected.getOrElse(d, 0L),
        s"digit $d: ${census.getOrElse(d, 0L)} vs BigDecimal ${expected.getOrElse(d, 0L)}")
    }
    // all-nonpositive input fails loudly at execution
    val empty = Cleaning.benfordSignificant(Seq(0.0, -1.5).toDF("x"), col("x"))
    val ex = intercept[Exception](empty.collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}|${msgs(t.getCause)}"
    assert(msgs(ex).contains("no positive magnitudes"), msgs(ex).take(300))
  }
}
