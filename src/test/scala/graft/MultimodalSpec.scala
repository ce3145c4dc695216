package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "some payload bytes"), (2L, "other payload"), (3L, "x")
  ).toDF("doc_id", "text").select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))

  test("decodeStub is deterministic and preserves ids and byte counts") {
    val a = Multimodal.decodeStub(docs, "doc_id", "blob").collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStub(docs, "doc_id", "blob").collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq, "stub decode must be deterministic")
    assert(a.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(a.find(_.doc_id == 1L).get.n_bytes == "some payload bytes".length)
    assert(a.forall(m => m.sha.length == 64 && m.width > 0 && m.height > 0))
  }

  test("real codec roundtrip: synth png/bmp/gif decode to the arithmetic contract") {
    // ids crossing the format cycle, the 256 color wrap, and both parities
    // of height (the two bands split differently for odd/even heights)
    val ids = Seq(0L, 1L, 2L, 3L, 20L, 255L, 256L, 257L, 1000L, 12345L)
    val blobs = Multimodal.synthImages(ids.toDF("doc_id"), "doc_id")
    val metas = Multimodal.decodeImages(blobs, "doc_id", "blob")
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas.keySet == ids.toSet)
    ids.foreach { id =>
      val m = metas(id)
      val (w, h) = ((8 + id % 32).toInt, (8 + id % 24).toInt)
      val expFmt = (id % 3) match { case 0 => "png"; case 1 => "bmp"; case _ => "gif" }
      assert(m.format == expFmt, s"doc $id: sniffed ${m.format}, wrote $expFmt")
      assert(m.width == w && m.height == h, s"doc $id dims: $m")
      val (top, bot) = ((h + 1) / 2, h / 2)
      assert(m.sum_r == w.toLong * (top * (id % 256) + bot * (id * 3 % 256)), s"doc $id r: $m")
      assert(m.sum_g == w.toLong * (top * (id * 7 % 256) + bot * (id * 5 % 256)), s"doc $id g: $m")
      assert(m.sum_b == w.toLong * (top * (id * 13 % 256) + bot * (id * 11 % 256)), s"doc $id b: $m")
    }
  }

  test("real codec: format is sniffed from bytes, not trusted metadata") {
    // decode a payload whose id-derived format WOULD be png but whose
    // bytes are a real jpeg — the sniffer must report what the bytes are
    val jpegBytes = Multimodal.synthImageBytes(9L, "jpeg") // 9%3==0 -> png by id
    val df = Seq((9L, jpegBytes)).toDF("doc_id", "blob")
    val m = Multimodal.decodeImages(df, "doc_id", "blob").collect().head
    assert(m.format == "jpeg", s"sniffed ${m.format}")
    // jpeg is lossy: dimensions are exact, pixel sums only approximate
    assert(m.width == (8 + 9 % 32) && m.height == (8 + 9 % 24))
    val exact = w9Sums
    assert(math.abs(m.sum_r - exact._1).toDouble / math.max(exact._1, 1) < 0.15,
      s"jpeg sum_r too far from source: $m vs $exact")
  }

  private lazy val w9Sums: (Long, Long, Long) = {
    val (w, h) = (8L + 9 % 32, (8 + 9 % 24))
    val (top, bot) = ((h + 1) / 2, h / 2)
    (w * (top * (9 % 256) + bot * (9 * 3 % 256)),
     w * (top * (9 * 7 % 256) + bot * (9 * 5 % 256)),
     w * (top * (9 * 13 % 256) + bot * (9 * 11 % 256)))
  }

  test("quarantine decode: corrupt payloads become typed error rows, zero task failures") {
    // ids covering all three formats in each corruption class: %7==3
    // truncated (magic survives -> decode_error), %7==5 stamped
    // non-media (-> no_reader), rest intact
    val ids = (0L to 41L).toSeq
    val blobs = Multimodal.synthImages(ids.toDF("doc_id"), "doc_id")
    val out = Multimodal.decodeImagesOrQuarantine(
        Multimodal.corruptFixture(blobs, "doc_id", "blob"), "doc_id", "blob")
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet == ids.toSet, "every payload must produce exactly one row")
    ids.foreach { id =>
      val r = out(id)
      if (id % 7 == 3) {
        assert(r.status == "quarantined" && r.reason == "decode_error", s"doc $id: $r")
        assert(r.format.isEmpty && r.width.isEmpty && r.sum_r.isEmpty, s"doc $id: $r")
      } else if (id % 7 == 5) {
        assert(r.status == "quarantined" && r.reason == "no_reader", s"doc $id: $r")
        assert(r.format.isEmpty, s"doc $id: $r")
      } else {
        assert(r.status == "ok" && r.reason == "", s"doc $id: $r")
        // intact rows must carry the exact strict-decoder values
        val (w, h) = ((8 + id % 32).toInt, (8 + id % 24).toInt)
        val (top, bot) = ((h + 1) / 2, h / 2)
        assert(r.width.contains(w) && r.height.contains(h), s"doc $id: $r")
        assert(r.sum_r.contains(w.toLong * (top * (id % 256) + bot * (id * 3 % 256))),
          s"doc $id: $r")
      }
    }
    // the strict decoder on the same corrupted batch DOES fail the job —
    // the quarantine boundary is what converts that into error rows
    val boom = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImages(
        Multimodal.corruptFixture(blobs, "doc_id", "blob"), "doc_id", "blob").collect()
    }
    assert(boom.getMessage != null)
  }

  test("real audio codec roundtrip: synth WAV decodes to the arithmetic contract") {
    import org.apache.spark.sql.functions.col
    val ids = Seq(0L, 1L, 7L, 399L, 1000L).toDF("doc_id")
    val got = Multimodal.decodeAudio(Multimodal.synthAudio(ids, "doc_id"), "doc_id", "blob")
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(0L, 1L, 7L, 399L, 1000L)) {
      val m = got(id)
      // header facts come from the real parser, not the writer
      assert(m.channels == 1 && m.sample_rate == 8000 && m.bits == 16)
      // sample stats recomputed independently from the contract
      val n = 100 + id % 400
      val samples = (0L until n).map(i => ((id * 31 + i * 17) % 2001) - 1000)
      assert(m.n_samples == n)
      assert(m.sum_s == samples.sum, s"doc $id sample sum")
      assert(m.min_s == samples.min && m.max_s == samples.max)
    }
    // a corrupt payload fails loudly, not silently
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(bad, "doc_id", "blob").collect()
    }
  }

  test("audioFeatures: contract-recomputed RMS/ZCR/peak; zero samples break runs uncounted") {
    val ids = Seq(0L, 3L, 13L, 403L).toDF("doc_id")
    val got = Multimodal.audioFeatures(Multimodal.synthAudio(ids, "doc_id"), "doc_id", "blob")
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(0L, 3L, 13L, 403L)) {
      val samples = (0L until (100 + id % 400))
        .map(i => (((id * 31 + i * 17) % 2001) - 1000).toInt)
      val m = got(id)
      assert(m.n_samples == samples.length.toLong)
      assert(m.sumsq == samples.map(s => s.toLong * s).sum, s"doc $id energy")
      assert(m.n_cross ==
        samples.sliding(2).count(p => p.head.toLong * p(1) < 0), s"doc $id crossings")
      assert(m.peak == samples.map(math.abs).max, s"doc $id peak")
    }
    // the strict product rule on a hand-built WAV: [5, -3, 0, -2, 4] has
    // crossings only at 5→-3 and -2→4 — the zero sample breaks the run
    // without counting as a crossing in either direction
    def wav(samples: Seq[Int]): Array[Byte] = {
      val n = samples.length
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
        .putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(n * 2)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    val hand = Seq((9L, wav(Seq(5, -3, 0, -2, 4)))).toDF("doc_id", "blob")
    val f = Multimodal.audioFeatures(hand, "doc_id", "blob").collect().head
    assert(f.n_samples == 5L && f.sumsq == 54L && f.n_cross == 2L && f.peak == 5,
      s"hand fixture: $f")
    // a stereo payload must fail loudly naming the doc, never silently
    // interleave L/R into a meaningless ZCR (ADVICE r17)
    def stereoWav(samples: Seq[Int]): Array[Byte] = {
      val n = samples.length
      val bb = java.nio.ByteBuffer.allocate(44 + n * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 4)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
        .putInt(16).putShort(1).putShort(2)
        .putInt(8000).putInt(32000).putShort(4).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(n * 4)
      samples.foreach { s => bb.putShort(s.toShort); bb.putShort((-s).toShort) }
      bb.array()
    }
    val stereo = Seq((7L, stereoWav(Seq(5, -3, 4)))).toDF("doc_id", "blob")
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.audioFeatures(stereo, "doc_id", "blob").collect()
    }
    val msgs = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("|")
    assert(msgs.contains("doc 7") && msgs.contains("mono"),
      s"stereo must fail naming the doc: $msgs")
  }

  test("imageHistogram: bin counts match the textured pixel contract exactly") {
    val ids = Seq(0L, 13L, 41L)
    val got = Multimodal.imageHistogram(
        Multimodal.synthTexturedImages(ids.toDF("doc_id"), "doc_id"),
        "doc_id", "blob", bins = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (id <- ids) {
      val g = id / 40
      val m = (id % 40) / 10
      val expected = new Array[Long](16)
      for (y <- 0 until 16; x <- 0 until 18) {
        val v0 = ((g * 37 + x * 13 + y * 29) % 251).toInt
        val v = if (m > 0 && x == 2 * m && y == 2 * m + 1) (v0 + 96) % 256 else v0
        expected(v / 16) += 1
      }
      assert(got(id) == expected.toSeq, s"doc $id histogram")
      assert(got(id).sum == 18L * 16, s"doc $id pixel count")
    }
    // bins must divide the 256-level range evenly
    intercept[IllegalArgumentException](Multimodal.imageHistogram(
      Multimodal.synthTexturedImages(Seq(1L).toDF("doc_id"), "doc_id"),
      "doc_id", "blob", bins = 12))
  }

  test("real multi-frame codec roundtrip: synth GIF decodes frame-by-frame to the contract") {
    val ids = Seq(0L, 1L, 3L, 9L, 255L, 1000L)
    val got = Multimodal.decodeFrames(
        Multimodal.synthGifs(ids.toDF("doc_id"), "doc_id"), "doc_id", "blob")
      .collect().map(m => (m.doc_id, m.frame) -> m).toMap
    for (id <- ids) {
      val (w, h, nf) = ((8 + id % 16).toInt, (8 + id % 12).toInt, (2 + id % 4).toInt)
      // exactly nf frames, indexed 0..nf-1 — a dropped or phantom frame fails
      assert((0 until nf).forall(k => got.contains((id, k))), s"doc $id missing frames")
      assert(!got.contains((id, nf)), s"doc $id produced a phantom frame $nf")
      for (k <- 0 until nf) {
        val m = got((id, k))
        assert(m.width == w && m.height == h, s"doc $id frame $k dims")
        // solid frame color k, recomputed independently from the contract
        assert(m.sum_r == w.toLong * h * ((id + 17L * k) % 256), s"doc $id frame $k sum_r")
        assert(m.sum_g == w.toLong * h * ((id * 7 + 29L * k) % 256), s"doc $id frame $k sum_g")
        assert(m.sum_b == w.toLong * h * ((id * 13 + 31L * k) % 256), s"doc $id frame $k sum_b")
      }
    }
    // a corrupt payload fails loudly, not silently
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFrames(bad, "doc_id", "blob").collect()
    }
  }

  test("real compressed-audio codec: µ-law decode equals the closed-form G.711 expansion") {
    // the formula the q81 oracle states, verified against the REAL JDK
    // decoder on every one of the 256 µ-law code points
    def ulaw2linear(b: Int): Int = {
      val u = ~b & 0xff
      val mag = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
      if ((u & 0x80) != 0) -mag else mag
    }
    val ids = Seq(0L, 1L, 7L, 255L, 319L, 1000L)
    val got = Multimodal.decodeUlawAudio(
        Multimodal.synthUlawAudio(ids.toDF("doc_id"), "doc_id"), "doc_id", "blob")
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- ids) {
      val m = got(id)
      // header facts from the real parser: 8-bit µ-law mono at 8 kHz
      assert(m.channels == 1 && m.sample_rate == 8000 && m.bits == 8)
      val n = (80 + id % 320).toInt
      val samples = (0 until n).map(i => ulaw2linear(((id * 37 + i.toLong * 11) % 256).toInt))
      assert(m.n_samples == n)
      assert(m.sum_s == samples.map(_.toLong).sum, s"doc $id decoded sum")
      assert(m.min_s == samples.min && m.max_s == samples.max)
    }
    // exhaustive: one payload carrying every µ-law code point 0..255,
    // so the JDK-decoder-equals-formula claim holds for the WHOLE table,
    // not just the codes the synthesized docs happen to emit
    val raw = (0 until 256).map(_.toByte).toArray
    val wav = {
      val bb = java.nio.ByteBuffer.allocate(44 + 256).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 256)
        .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
        .putInt(16).putShort(7).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8).put("data".getBytes("US-ASCII")).putInt(256)
      bb.put(raw); bb.array()
    }
    val full = Multimodal.decodeUlawAudio(
      Seq((42L, wav)).toDF("doc_id", "blob"), "doc_id", "blob").collect().head
    val table = (0 until 256).map(ulaw2linear)
    assert(full.n_samples == 256 && full.sum_s == table.map(_.toLong).sum &&
      full.min_s == table.min && full.max_s == table.max,
      "JDK µ-law decoder must equal the G.711 formula over all 256 codes")
    // a corrupt payload fails loudly; a PCM (non-µ-law) payload is refused
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeUlawAudio(
        Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob"), "doc_id", "blob").collect()
    }
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeUlawAudio(
        Multimodal.synthAudio(Seq(1L).toDF("doc_id"), "doc_id"), "doc_id", "blob").collect()
    }
  }

  test("media lake: format-partitioned layout, pruned reads, intact blobs") {
    val dir = java.nio.file.Files.createTempDirectory("medialake").toString
    Multimodal.writeMediaLake(docs, "doc_id", "blob", dir)
    // one directory per decoded format
    val parts = new java.io.File(dir).listFiles.map(_.getName)
      .filter(_.startsWith("format=")).toSet
    val formats = Multimodal.decodeStub(docs, "doc_id", "blob")
      .collect().map(m => s"format=${m.format}").toSet
    assert(parts == formats)
    // a format filter is a PARTITION filter (pruned before I/O), not a data filter
    val someFormat = formats.head.stripPrefix("format=")
    val pruned = Multimodal.readFormat(spark, dir, someFormat)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains(s"PartitionFilters: [isnotnull(format"),
      s"format filter must prune partitions, plan was:\n$scan")
    // blobs survive the roundtrip byte-for-byte
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("blob")).collect()
      .map(r => r.getLong(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(back == Map(1L -> "some payload bytes", 2L -> "other payload", 3L -> "x"))
    // metadata is scannable without the blob column in the read schema
    val metaOnly = spark.read.parquet(dir).select("doc_id", "n_bytes", "sha")
    val schemaLine = metaOnly.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("ReadSchema:")).getOrElse("")
    assert(schemaLine.nonEmpty && !schemaLine.contains("blob"),
      s"metadata scan must prune the blob column; scan read: $schemaLine")
    assert(metaOnly.count() == 3)
  }

  test("resizeStub: deterministic typed output with target dims") {
    val a = Multimodal.resizeStub(docs, "doc_id", "blob", 64, 48).collect()
    val b = Multimodal.resizeStub(docs, "doc_id", "blob", 64, 48).collect()
    assert(a.toSeq.sortBy(_.getLong(0)) == b.toSeq.sortBy(_.getLong(0)))
    assert(a.forall(r => r.getInt(1) == 64 && r.getInt(2) == 48 && r.getString(4).length == 64))
  }

  test("featureStub vectors are unit-norm and compose with the similarity operators") {
    import graft.operators.Similarity
    val feats = Multimodal.featureStub(docs, "doc_id", "blob", dim = 16)
    val rows = feats.as[(Long, Seq[Float])].collect()
    assert(rows.length == 3 && rows.forall(_._2.length == 16))
    rows.foreach { case (_, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"unit norm expected, got $n")
    }
    // schema-compatible with the similarity surface: run IVF assignment
    // over the extracted features (centroids = first 2 docs' vectors)
    val vecs = feats.select(col("doc_id").as("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val assign = Similarity.ivfAssign(vecs, vecs.filter(col("vec_id") <= 2))
      .as[(Long, Long)].collect().toMap
    assert(assign.keySet == Set(1L, 2L, 3L))
    assert(assign(1L) == 1L && assign(2L) == 2L,
      "a centroid's own vector must assign to itself (cosine 1.0)")
  }

  test("frameSample emits n frames per doc with in-range offsets") {
    val frames = Multimodal.frameSample(docs, "doc_id", "blob", n = 4)
      .as[(Long, Int, Int, String)].collect()
    assert(frames.count(_._1 == 1L) == 4)
    assert(frames.count(_._1 == 3L) == 4, "1-byte payload still yields n frames")
    assert(frames.forall { case (_, f, off, sha) => f >= 0 && f < 4 && off >= 0 && sha.nonEmpty })
  }

  // ── perceptual-hash image dedup (textured synth → cells → dHash) ──────

  /** The synthTexturedBytes pixel contract, restated independently. */
  private def texturedPixel(id: Long, x: Int, y: Int): Long = {
    val g = id / 40; val m = (id % 40) / 10
    val v0 = (g * 37 + x * 13 + y * 29) % 251
    if (m > 0 && x == 2 * m && y == 2 * m + 1) (v0 + 96) % 256 else v0
  }

  private def texturedCells(id: Long): Seq[Long] = {
    val cells = Array.fill(72)(0L)
    for (y <- 0 until 16; x <- 0 until 18)
      cells((y / 2) * 9 + (x / 2)) += texturedPixel(id, x, y)
    cells.toSeq
  }

  test("decodeCellSums round-trips the textured contract through the real PNG codec") {
    val ids = Seq(7L, 17L, 27L, 37L, 47L).toDF("doc_id")
    val cells = Multimodal.decodeCellSums(
        Multimodal.synthTexturedImages(ids, "doc_id"), "doc_id", "blob", 2, 2)
      .as[(Long, Seq[Long])].collect().toMap
    for (id <- Seq(7L, 17L, 27L, 37L, 47L))
      assert(cells(id) == texturedCells(id), s"doc $id cell sums drifted")
  }

  test("decodeCellSums rejects non-divisible dimensions loudly") {
    val blobs = Multimodal.synthTexturedImages(Seq(7L).toDF("doc_id"), "doc_id")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeCellSums(blobs, "doc_id", "blob", 5, 2).collect()
    }
    assert(ex.getMessage.contains("not divisible") ||
      ex.getCause != null && ex.getCause.getMessage.contains("not divisible"))
  }

  test("dHash64: planted member perturbation flips at most 2 bits vs its base") {
    val ids = Seq(7L, 17L, 27L, 37L).toDF("doc_id")
    val hashes = Multimodal.decodeCellSums(
        Multimodal.synthTexturedImages(ids, "doc_id"), "doc_id", "blob", 2, 2)
      .select(col("doc_id"), Multimodal.dHash64(col("cells"), 9, 8).as("sh"))
      .as[(Long, Long)].collect().toMap
    for (m <- Seq(17L, 27L, 37L)) {
      val d = java.lang.Long.bitCount(hashes(7L) ^ hashes(m))
      assert(d <= 2, s"member $m at hamming $d from base")
    }
    intercept[IllegalArgumentException] {
      Multimodal.dHash64(col("cells"), 9, 9)
    }
  }

  test("dHash64 is invariant to a global brightness shift") {
    val ids = Seq(7L, 127L).toDF("doc_id")
    val cells = Multimodal.decodeCellSums(
        Multimodal.synthTexturedImages(ids, "doc_id"), "doc_id", "blob", 2, 2)
    val base = cells
      .select(col("doc_id"), Multimodal.dHash64(col("cells"), 9, 8).as("sh"))
      .as[(Long, Long)].collect().toMap
    // +5 per pixel = +20 per cell: order between adjacent cells unchanged
    val brightened = cells
      .select(col("doc_id"),
        Multimodal.dHash64(transform(col("cells"), c => c + lit(20L)), 9, 8).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(base == brightened)
  }

  test("banded 64-bit image near-dup equals the all-pairs Hamming scan") {
    val ids = (0L until 200L).filter(_ % 10 == 7).toDF("doc_id")
    val hashes = Multimodal.decodeCellSums(
        Multimodal.synthTexturedImages(ids, "doc_id"), "doc_id", "blob", 2, 2)
      .select(col("doc_id"), Multimodal.dHash64(col("cells"), 9, 8).as("sh"))
    val banded = graft.operators.Dedup.simHashNearDups(hashes, maxDist = 3, bits = 64)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val hs = hashes.as[(Long, Long)].collect()
    val all = (for {
      (da, sa) <- hs; (db, sb) <- hs if da < db
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (da, db, d.toLong)).sorted.toSeq
    assert(banded == all, "pigeonhole banding must lose no pair at dist <= maxDist")
    assert(banded.nonEmpty, "fixture must plant detectable near-dups")
    // within-group (base, member) pairs are guaranteed hits
    assert(banded.exists { case (da, db, _) => da / 40 == db / 40 })
  }
}
