package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, processed
  * by a batch-oriented per-partition kernel — the Scala analogue of a
  * vectorized Python `mapInPandas` decode stage.
  *
  * Image decode ([[decodeImages]], javax.imageio: PNG/BMP/GIF/JPEG),
  * audio decode ([[decodeAudio]], javax.sound.sampled: WAV/PCM) and
  * multi-frame decode ([[decodeFrames]], javax.imageio GIF sequences —
  * the video-keyframe kernel shape) are REAL — each parses the container
  * with the JDK codec and reads every pixel/sample back, hash-gated
  * against arithmetic oracles (q40/q73/q76). Only formats with no JVM
  * codec in this environment stay stubbed (webp, compressed audio, true
  * video codecs): [[decodeStub]] derives deterministic fake metadata from
  * the raw bytes, and everything around it — the binary column schema,
  * the `Dataset` encoder boundary, partition-preserving execution, the
  * typed output schema — is the real production shape: swap `fakeDecode`
  * for a JNI/codec call and nothing else changes.
  */
object Multimodal {

  /** Typed metadata a real decoder would produce. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      sha: String)

  private def sha256Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  /** The stubbed decoder: deterministic pseudo-metadata from payload bytes.
    * A real implementation would parse the container header here. */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val fmt = (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" }
    MediaMeta(id, fmt, 16 + n % 640, 16 + (n * 7) % 480, n.toLong, sha256Hex(bytes))
  }

  /** Decode a binary column to typed media metadata, batch-per-partition.
    * Input: any DataFrame with (`idCol`: long, `blobCol`: binary). */
  def decodeStub(df: DataFrame, idCol: String, blobCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
  }

  // ---------------------------------------------------------------------
  // Real image codec path — javax.imageio ships PNG/BMP/GIF/JPEG codecs
  // with every JDK, so image decode needs no external dependency. The
  // remaining decodeStub covers only formats with no JVM codec here
  // (webp/audio/video).
  // ---------------------------------------------------------------------

  /** Decoded-image metadata: dimensions from the real decoder plus exact
    * per-channel pixel sums (sums, not means, so the values stay integral
    * and bit-comparable across engines). */
  final case class ImageMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** The deterministic image-synthesis contract (shared by the Scala
    * generator and the q40 SQL oracle, which re-derives every value below
    * arithmetically from `doc_id`):
    *  - format: id%3 → png / bmp / gif (all lossless in javax.imageio, so
    *    decoded pixels equal encoded pixels exactly; JPEG decode is real
    *    too but lossy, covered by MultimodalSpec with dimension-only
    *    assertions);
    *  - width 8+id%32, height 8+id%24;
    *  - two horizontal bands: top ceil(h/2) rows in color A =
    *    (id, 7id, 13id) % 256, bottom floor(h/2) rows in color B =
    *    (3id, 5id, 11id) % 256.
    * Requires non-negative ids (SQL `%` and Scala `%` agree only there). */
  private[graft] def synthFormat(id: Long): String =
    (id % 3) match { case 0 => "png"; case 1 => "bmp"; case _ => "gif" }

  private[graft] def synthImageBytes(id: Long, fmt: String): Array[Byte] = {
    require(id >= 0, s"image synthesis requires non-negative ids, got $id")
    val w = (8 + id % 32).toInt
    val h = (8 + id % 24).toInt
    val a = ((id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt)
    val b = ((id * 3 % 256).toInt, (id * 5 % 256).toInt, (id * 11 % 256).toInt)
    def rgb(c: (Int, Int, Int)): Int = c._1 << 16 | c._2 << 8 | c._3
    // GIF is palette-based: hand it an indexed image whose palette IS the
    // two band colors, so the writer quantizes to exactly those (an RGB
    // image would invite writer-chosen palette quantization and break the
    // lossless contract); PNG/BMP/JPEG take plain RGB
    val img =
      if (fmt == "gif") {
        val cm = new java.awt.image.IndexColorModel(8, 2,
          Array(a._1.toByte, b._1.toByte),
          Array(a._2.toByte, b._2.toByte),
          Array(a._3.toByte, b._3.toByte))
        new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      } else new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val c = if (y < (h + 1) / 2) rgb(a) else rgb(b)
      var x = 0
      while (x < w) { img.setRGB(x, y, c); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per call
    require(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  /** One real encoded image per input row: (`idCol`, blob). Format and
    * content derive deterministically from the id (see the contract on
    * [[synthImageBytes]]). */
  def synthImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthImageBytes(id, synthFormat(id)))))
      .toDF(idCol, "blob")
  }

  /** REAL image decode, batch-per-partition: container sniffing via the
    * registered ImageIO readers (not trusted metadata), then a full pixel
    * decode with per-channel sums. This is the production kernel shape —
    * the only thing a cluster deployment changes is the codec set. */
  def decodeImages(df: DataFrame, idCol: String, blobCol: String): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => decodeOneImage(id, bytes) }
      }
  }

  /** Thrown when no registered ImageIO reader recognizes the container
    * bytes — an `IllegalArgumentException` subtype so [[decodeImages]]'s
    * historical contract (require-style failure) is unchanged, while
    * [[decodeImagesOrQuarantine]] can classify it without string
    * matching. */
  final class NoReaderException(msg: String) extends IllegalArgumentException(msg)

  /** The per-row image decode kernel shared by the strict and the
    * quarantining decoders. Throws [[NoReaderException]] when the
    * container is unrecognized; whatever the matched codec throws when
    * the payload is truncated/corrupt past its magic. */
  private def decodeOneImage(id: Long, bytes: Array[Byte]): ImageMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) {
      iis.close()
      throw new NoReaderException(s"doc $id: no ImageIO reader for payload")
    }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val fmt = reader.getFormatName.toLowerCase
      val img = reader.read(0)
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      ImageMeta(id, fmt, w, h, sr, sg, sb)
    } finally {
      // dispose() releases the reader but NOT the input stream it
      // was given — close iis too or each row leaks a stream handle
      reader.dispose()
      iis.close()
    }
  }

  /** One output row per input payload, decoded OR quarantined: `status`
    * is `ok`/`quarantined`, `reason` is `''`/`no_reader`/`decode_error`,
    * and the [[ImageMeta]] fields are null on quarantined rows. */
  final case class ImageOrQuarantine(
      doc_id: Long,
      status: String,
      reason: String,
      format: Option[String],
      width: Option[Int],
      height: Option[Int],
      sum_r: Option[Long],
      sum_g: Option[Long],
      sum_b: Option[Long])

  /** QUARANTINE decode — the first thing a production media lake needs
    * that the strict kernel ([[decodeImages]]) refuses to be: a crawl
    * segment's malformed payloads (truncated downloads, mislabeled
    * content types, hostile bytes) must become TYPED ERROR ROWS, never
    * task failures — one bad blob in a 10k-row task would otherwise
    * retry (and re-fail) the 9 999 good rows around it 4 times and then
    * kill the job. The catch sits exactly at the codec boundary, the
    * same place the honest mp3/video stubs live: `no_reader` when no
    * codec claims the container, `decode_error` when the matched codec
    * throws on the payload. Map-only (one `mapPartitions` over the
    * blobs, no shuffle); downstream splits the stream with a
    * `status = 'ok'` filter and routes the quarantine partition to its
    * own sink. */
  def decodeImagesOrQuarantine(
      df: DataFrame, idCol: String, blobCol: String): Dataset[ImageOrQuarantine] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          try {
            val m = decodeOneImage(id, bytes)
            ImageOrQuarantine(id, "ok", "", Some(m.format), Some(m.width),
              Some(m.height), Some(m.sum_r), Some(m.sum_g), Some(m.sum_b))
          } catch {
            case _: NoReaderException =>
              ImageOrQuarantine(id, "quarantined", "no_reader",
                None, None, None, None, None, None)
            case scala.util.control.NonFatal(_) =>
              ImageOrQuarantine(id, "quarantined", "decode_error",
                None, None, None, None, None, None)
          }
        }
      }
  }

  /** Deterministic corruption fixture for the quarantine gates: payloads
    * for `id % 7 == 3` are truncated to their first 10 bytes (the
    * container magic survives — PNG 8 B, BMP 2 B, GIF 6 B — so a reader
    * is FOUND and then fails mid-parse: `decode_error`), payloads for
    * `id % 7 == 5` are replaced with a non-media stamp (no reader
    * matches: `no_reader`); everything else passes through intact. */
  def corruptFixture(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    df.withColumn(blobCol,
      when(col(idCol) % 7 === 3, expr(s"substring($blobCol, 1, 10)"))
        .when(col(idCol) % 7 === 5,
          lit("NOTMEDIA-0123456789".getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
        .otherwise(col(blobCol)))

  // ---------------------------------------------------------------------
  // Image perceptual-hash dedup (the LAION-pipeline image-dedup kernel):
  // decode -> box-downscale -> dHash -> banded Hamming join. The banding
  // reuses Dedup.simHashNearDups(bits = 64) unchanged — a 64-bit hash is
  // a 64-bit hash, whatever modality produced it.
  // ---------------------------------------------------------------------

  /** The deterministic TEXTURED image contract (q156's fixture — the
    * two-band [[synthImageBytes]] images are too regular for a
    * meaningful perceptual hash, every gradient being constant): 18×16
    * grayscale PNG, pixel value `v(x,y) = (g·37 + x·13 + y·29) % 251`
    * with group `g = id / 40`; member `m = (id % 40) / 10 > 0` perturbs
    * the SINGLE pixel `(2m, 2m+1)` by `(v+96) % 256` — so the four
    * members of a group are planted near-duplicates (≤ 2 dHash bits from
    * the base, the perturbed pixel living inside one downscale cell)
    * while distinct groups differ pseudo-randomly. Non-negative ids
    * required (Scala/SQL `%` agreement). */
  private[graft] def synthTexturedBytes(id: Long): Array[Byte] = {
    require(id >= 0, s"image synthesis requires non-negative ids, got $id")
    val g = id / 40
    val m = (id % 40) / 10
    val (w, h) = (18, 16)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v0 = ((g * 37 + x * 13 + y * 29) % 251).toInt
        val v = if (m > 0 && x == 2 * m && y == 2 * m + 1) ((v0 + 96) % 256) else v0
        img.setRGB(x, y, v << 16 | v << 8 | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "png", baos), "no png writer")
    baos.toByteArray
  }

  /** One textured PNG per input row: (`idCol`, blob) — see
    * [[synthTexturedBytes]] for the pixel contract. */
  def synthTexturedImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthTexturedBytes(id))))
      .toDF(idCol, "blob")
  }

  /** Per-image LUMINANCE HISTOGRAM from a REAL decode — the image-side
    * quality/near-uniformity signal (an all-black scan, a blank page, a
    * constant-color placeholder all collapse to one or two bins; a
    * natural image spreads): `bins` equal-width cells over the 0–255
    * range, counts exact integers so the histogram is bit-comparable
    * across engines (entropy and ratios derive columnar downstream and
    * round there). Grayscale contract: luminance = the green channel
    * (identical to r/b on the gray fixtures; a production variant would
    * take the BT.601 weighted sum — the plumbing is the point here).
    * Same codec-boundary `mapPartitions` + in-kernel pixel reduction as
    * [[decodeImages]]. Returns `(doc_id, hist: array<bigint>[bins])`. */
  def imageHistogram(df: DataFrame, idCol: String, blobCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2 && 256 % bins == 0,
      s"bins must divide 256 evenly and be >= 2, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val width = 256 / bins
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: no ImageIO reader for payload")
          val counts = new Array[Long](bins)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val v = (img.getRGB(x, y) >> 8) & 0xff // green channel
              counts(v / width) += 1
              x += 1
            }
            y += 1
          }
          (id, counts.toSeq)
        }
      }.toDF(idCol, "hist")
  }

  /** Per-image downscale-cell GRAY sums from a REAL decode — the
    * perceptual-hash front half: the image is box-partitioned into
    * (w/cw)×(h/ch) cells and each cell's green-channel sum is emitted
    * row-major (`cells[j·gw + i]`). Summing equal-size cells instead of
    * averaging keeps every value integer-exact (comparisons between
    * sums ≡ comparisons between means). Same codec-boundary
    * `mapPartitions` + in-kernel pixel reduction as [[decodeImages]];
    * everything after this row (bits, hash, banded join) is DataFrame
    * expressions. Dimensions must divide evenly — a production resize
    * would interpolate; the gate fixture is exact by construction. */
  def decodeCellSums(df: DataFrame, idCol: String, blobCol: String,
      cw: Int, ch: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"doc $id: no ImageIO reader for payload")
          val (w, h) = (img.getWidth, img.getHeight)
          require(w % cw == 0 && h % ch == 0,
            s"doc $id: ${w}x$h not divisible by cell ${cw}x$ch")
          val (gw, gh) = (w / cw, h / ch)
          val cells = new Array[Long](gw * gh)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              cells((y / ch) * gw + (x / cw)) += (img.getRGB(x, y) >> 8) & 0xff
              x += 1
            }
            y += 1
          }
          (id, cells.toSeq)
        }
      }
      .toDF(idCol, "cells")
  }

  /** 64-bit difference hash (dHash) over a row-major cell-sum array:
    * bit `b` (row `j = b / (gw−1)`, column `i = b % (gw−1)`) is 1 iff
    * `cells[j·gw+i] > cells[j·gw+i+1]` — the classic
    * brighter-than-right-neighbor gradient signature, robust to global
    * brightness/contrast shifts because only ORDER between adjacent
    * cells matters. Built as two 32-bit halves summed from exact powers
    * (a Σ bit·2⁶³ would overflow BIGINT in the oracle; the halves stay
    * positive and exact in both engines) and OR-combined — the output
    * long is drop-in for [[graft.operators.Dedup.simHashNearDups]]'
    * 16-bit pigeonhole banding at `bits = 64`. Requires
    * `(gw−1)·gh == 64` (e.g. the 9×8 grid of the standard dHash). */
  def dHash64(cells: Column, gw: Int, gh: Int): Column = {
    require((gw - 1) * gh == 64,
      s"dHash grid must yield 64 bits, got ${(gw - 1) * gh}")
    def half(h: Int): Column =
      aggregate(sequence(lit(h * 32), lit(h * 32 + 31)), lit(0L), (acc, b) => {
        val j = floor(b / lit(gw - 1)).cast("int")
        val i = (b % lit(gw - 1)).cast("int")
        val left = element_at(cells, (j * lit(gw) + i + lit(1)).cast("int"))
        val right = element_at(cells, (j * lit(gw) + i + lit(2)).cast("int"))
        acc + when(left > right,
          pow(lit(2), (b % lit(32)).cast("int")).cast("long")).otherwise(lit(0L))
      })
    half(0).bitwiseOR(shiftleft(half(1), 32))
  }

  // ---------------------------------------------------------------------
  // Real audio codec path — javax.sound.sampled ships a WAV/PCM parser
  // with every JDK, so audio decode (like image decode above) needs no
  // external dependency. Compressed audio (mp3/ogg/aac) and video remain
  // stubbed: no JVM codec exists here.
  // ---------------------------------------------------------------------

  /** Decoded-audio metadata: container facts from the real parser plus
    * exact integer sample statistics (sum/min/max, not float RMS, so the
    * values stay bit-comparable across engines). */
  final case class AudioMeta(
      doc_id: Long,
      channels: Int,
      sample_rate: Int,
      bits: Int,
      n_samples: Long,
      sum_s: Long,
      min_s: Int,
      max_s: Int)

  /** The deterministic audio-synthesis contract (shared by the Scala
    * generator and the q73 SQL oracle, which re-derives every value
    * arithmetically from `doc_id`): PCM signed 16-bit little-endian mono
    * at 8000 Hz, n = 100 + id%400 samples, sample i =
    * ((id·31 + i·17) mod 2001) − 1000. Requires non-negative ids (SQL and
    * Scala `%` agree only there). */
  private[graft] def synthWavBytes(id: Long): Array[Byte] = {
    require(id >= 0, s"audio synthesis requires non-negative ids, got $id")
    val n = (100 + id % 400).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i.toLong * 17) % 2001) - 1000).toShort)
      i += 1
    }
    bb.array()
  }

  /** One real WAV payload per input row: (`idCol`, blob) — the audio twin
    * of [[synthImages]]. */
  def synthAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthWavBytes(id))))
      .toDF(idCol, "blob")
  }

  /** REAL audio decode, batch-per-partition: the container is parsed by
    * `javax.sound.sampled.AudioSystem` (header facts come from the codec,
    * not trusted metadata) and every PCM frame is read back for exact
    * integer sample statistics. Same production kernel shape as
    * [[decodeImages]] — a cluster deployment only widens the codec set. */
  def decodeAudio(df: DataFrame, idCol: String, blobCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"doc $id: expected PCM_SIGNED, got ${fmt.getEncoding}")
          require(fmt.getSampleSizeInBits == 16, s"doc $id: expected 16-bit samples")
          val data = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var (n, sum) = (0L, 0L)
          var (mn, mx) = (Int.MaxValue, Int.MinValue)
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toInt
            n += 1; sum += s
            if (s < mn) mn = s
            if (s > mx) mx = s
          }
          AudioMeta(id, fmt.getChannels, fmt.getSampleRate.toInt,
            fmt.getSampleSizeInBits, n, sum, mn, mx)
        } finally ais.close()
      })
  }

  /** Per-clip audio features: exact integer accumulators so every value
    * stays bit-comparable across engines ([[AudioMeta]]'s discipline) —
    * the float RMS/ZCR ratios are derived downstream from these and
    * rounded there. `n_cross` counts STRICT sign changes
    * (`s_{i−1}·s_i < 0` — a zero sample breaks a run without counting,
    * the unambiguous integer rule), `sumsq` is the exact energy sum
    * (≤ peak²·n, far inside a long), `peak = max |s|`. */
  final case class AudioFeatures(
      doc_id: Long,
      n_samples: Long,
      sumsq: Long,
      n_cross: Long,
      peak: Int)

  /** DSP feature extraction at the codec boundary — the analysis pass a
    * speech-corpus pipeline runs right after [[decodeAudio]]'s
    * validation: RMS energy (loudness/silence gate), zero-crossing rate
    * (the classic cheap voiced/unvoiced and noise discriminator,
    * Rabiner & Schafer 1978), and peak (clipping detection). One pass
    * over the PCM frames per clip inside the same typed
    * `mapPartitions` kernel as [[decodeAudio]] (javax.sound needs JVM
    * objects — the documented codec-boundary exception); everything
    * after the kernel is plain columnar arithmetic. */
  def audioFeatures(df: DataFrame, idCol: String, blobCol: String): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"doc $id: expected PCM_SIGNED, got ${fmt.getEncoding}")
          require(fmt.getSampleSizeInBits == 16, s"doc $id: expected 16-bit samples")
          // a stereo payload would silently interleave L/R samples —
          // meaningless zero-crossing count, n_samples = frames×channels
          // — so fail loudly like the other format guards (ADVICE r17)
          require(fmt.getChannels == 1,
            s"doc $id: expected mono audio, got ${fmt.getChannels} channels")
          val data = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(data).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var n = 0L; var sumsq = 0L; var crossings = 0L; var peak = 0
          var prev = 0
          while (bb.remaining() >= 2) {
            val s = bb.getShort.toInt
            sumsq += s.toLong * s
            if (n > 0 && prev.toLong * s < 0) crossings += 1
            val a = math.abs(s)
            if (a > peak) peak = a
            prev = s; n += 1
          }
          AudioFeatures(id, n, sumsq, crossings, peak)
        } finally ais.close()
      })
  }

  /** The deterministic COMPRESSED-audio synthesis contract (shared with
    * the q81 SQL oracle): G.711 µ-law mono at 8000 Hz — a real companding
    * codec the JDK ships a decoder for — with n = 80 + id%320 code bytes,
    * byte i = (id·37 + i·11) mod 256. The oracle re-derives the decoded
    * 16-bit samples arithmetically because µ-law expansion is closed-form
    * (sign/exponent/mantissa: u = 255−b; mag = ((u%16)·8+132)·2^((u/16)%8)
    * − 132; negative when u ≥ 128) — verified equal to the JDK decoder on
    * all 256 code points (MultimodalSpec). Requires non-negative ids. */
  private[graft] def synthUlawBytes(id: Long): Array[Byte] = {
    require(id >= 0, s"audio synthesis requires non-negative ids, got $id")
    val n = (80 + id % 320).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(7).putShort(1) // WAVE format 7 = µ-law, mono
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(n)
    var i = 0
    while (i < n) {
      bb.put(((id * 37 + i.toLong * 11) % 256).toByte)
      i += 1
    }
    bb.array()
  }

  /** One real µ-law WAV payload per input row — the compressed-audio twin
    * of [[synthAudio]]. */
  def synthUlawAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthUlawBytes(id))))
      .toDF(idCol, "blob")
  }

  /** REAL compressed-audio decode: the container is parsed by
    * `javax.sound.sampled`, the µ-law payload is DECOMPRESSED through the
    * JDK's format-conversion chain (`AudioSystem.getAudioInputStream
    * (targetFormat, source)` — the same API a production transcoder
    * uses), and every expanded 16-bit sample is read back for exact
    * integer statistics. Header facts (channels, rate, the source's
    * 8-bit code width) come from the codec, not trusted metadata;
    * non-µ-law or corrupt payloads THROW (pinned in MultimodalSpec). */
  def decodeUlawAudio(df: DataFrame, idCol: String, blobCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = src.getFormat
          require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.ULAW,
            s"doc $id: expected ULAW, got ${f.getEncoding}")
          require(f.getSampleSizeInBits == 8, s"doc $id: expected 8-bit µ-law codes")
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
            f.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
          try {
            val data = pcm.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(data)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var (n, sum) = (0L, 0L)
            var (mn, mx) = (Int.MaxValue, Int.MinValue)
            while (bb.remaining() >= 2) {
              val s = bb.getShort.toInt
              n += 1; sum += s
              if (s < mn) mn = s
              if (s > mx) mx = s
            }
            AudioMeta(id, f.getChannels, f.getSampleRate.toInt,
              f.getSampleSizeInBits, n, sum, mn, mx)
          } finally pcm.close()
        } finally src.close()
      })
  }

  // ---------------------------------------------------------------------
  // Real multi-frame path — javax.imageio's GIF codec reads and writes
  // image SEQUENCES, which gives a real, hash-gateable analogue of video
  // keyframe extraction (per-frame decode of a multi-frame container)
  // with zero new dependencies. True video codecs (h264/vp9) have no JVM
  // implementation here and stay stubbed ([[frameSample]]).
  // ---------------------------------------------------------------------

  /** One decoded frame of a multi-frame container: frame index + the same
    * exact per-channel pixel sums as [[ImageMeta]]. */
  final case class FrameMeta(
      doc_id: Long,
      frame: Int,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** The deterministic animated-GIF synthesis contract (shared by the
    * Scala generator and the q76 SQL oracle, which re-derives every value
    * arithmetically from `doc_id`):
    *  - width 8+id%16, height 8+id%12, frames nf = 2+id%4;
    *  - frame k is a SOLID color ((id+17k)%256, (7id+29k)%256,
    *    (13id+31k)%256) — sum_c = w·h·c exactly, because each frame is
    *    written with a 2-entry palette both of whose entries ARE the
    *    frame color (GIF is palette-based; letting the writer quantize an
    *    RGB image would break the lossless contract, as in q40's GIF
    *    case). Requires non-negative ids. */
  private[graft] def synthGifBytes(id: Long): Array[Byte] = {
    require(id >= 0, s"gif synthesis requires non-negative ids, got $id")
    val w = (8 + id % 16).toInt
    val h = (8 + id % 12).toInt
    val nf = (2 + id % 4).toInt
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var k = 0
      while (k < nf) {
        val r = ((id + 17L * k) % 256).toInt
        val g = ((id * 7 + 29L * k) % 256).toInt
        val b = ((id * 13 + 31L * k) % 256).toInt
        val cm = new java.awt.image.IndexColorModel(8, 2,
          Array(r.toByte, r.toByte), Array(g.toByte, g.toByte), Array(b.toByte, b.toByte))
        // raster defaults to all-zero indices → every pixel is palette
        // entry 0 = the frame color; no pixel loop needed
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        k += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** One real animated-GIF payload per input row: (`idCol`, blob) — the
    * multi-frame twin of [[synthImages]]. */
  def synthGifs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, synthGifBytes(id))))
      .toDF(idCol, "blob")
  }

  /** REAL multi-frame decode (the video-keyframe kernel shape): container
    * sniffing via the registered ImageIO readers, frame count from
    * `getNumImages(true)` (a full stream scan, not trusted metadata),
    * then an independent `read(k)` + exact channel sums per frame. One
    * output row per (doc, frame); corrupt payloads THROW (pinned in
    * MultimodalSpec) rather than returning partial rows. */
  def decodeFrames(df: DataFrame, idCol: String, blobCol: String): Dataset[FrameMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"doc $id: no ImageIO reader for payload")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val nf = reader.getNumImages(true)
            // strict Vector: every frame is decoded BEFORE the reader is
            // disposed (a lazy view would read from a closed stream)
            (0 until nf).map { k =>
              val img = reader.read(k)
              val (w, h) = (img.getWidth, img.getHeight)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              FrameMeta(id, k, w, h, sr, sg, sb)
            }
          } finally {
            reader.dispose()
            iis.close()
          }
        }
      }
  }

  /** Frame-sample analogue: slice `n` evenly spaced fixed-size windows out
    * of a payload (video keyframe sampling shape, stub payload math). */
  def frameSample(df: DataFrame, idCol: String, blobCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val stride = math.max(1, bytes.length / math.max(n, 1))
        (0 until n).iterator.map { i =>
          val off = math.min(i * stride, math.max(bytes.length - 1, 0))
          val len = math.min(16, bytes.length - off)
          (id, i, off, sha256Hex(bytes.slice(off, off + len)))
        }
      }
      .toDF("doc_id", "frame", "offset", "frame_sha")
  }

  /** Resize analogue: target dimensions + a deterministic content hash of
    * the "resampled" payload (stub: the real kernel would decode, resample
    * and re-encode here; the partition-preserving batch shape, the typed
    * output and the determinism contract are what production swaps onto). */
  def resizeStub(df: DataFrame, idCol: String, blobCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val meta = fakeDecode(id, bytes)
        val scale = targetW.toDouble / math.max(meta.width, 1)
        (id, targetW, targetH, scale,
          sha256Hex(bytes ++ s"|$targetW x $targetH".getBytes("UTF-8")))
      })
      .toDF("doc_id", "width", "height", "scale", "sha")
  }

  /** Feature-extraction analogue: a deterministic unit-norm float vector
    * derived from payload bytes (stub for a real image/audio embedding
    * model). The output column is schema-compatible with the `embeddings`
    * table, so the whole similarity surface — brute-force cosine top-k,
    * IVF bucketing (`Similarity`), cosine near-dup (q34) — composes
    * directly onto decoded media (asserted in MultimodalSpec). */
  def featureStub(df: DataFrame, idCol: String, blobCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val md = MessageDigest.getInstance("SHA-256")
        // expand the digest into dim pseudo-features, then L2-normalize
        val raw = Array.tabulate(dim) { i =>
          md.reset()
          md.update(bytes)
          // full 4-byte index: a single-byte seed would wrap at 256 and
          // silently duplicate coordinates i and i+256 for dim > 256
          md.update(java.nio.ByteBuffer.allocate(4).putInt(i).array())
          val d = md.digest()
          (((d(0) & 0xff) << 8 | (d(1) & 0xff)).toFloat / 65535f) - 0.5f
        }
        val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat max 1e-9f
        (id, raw.map(_ / norm))
      })
      .toDF(idCol, "embedding")
  }

  /** Media-lake layout: payloads + decoded metadata written as parquet
    * PARTITIONED BY the decoded format. This is the 100 TB shape — binary
    * blobs ride along in parquet pages, metadata columns are scannable
    * without touching blob bytes (column pruning), and a format-filtered
    * read prunes whole directories before any I/O (partition pruning —
    * asserted on the plan in MultimodalSpec). */
  def writeMediaLake(df: DataFrame, idCol: String, blobCol: String, dir: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    // single map pass carrying blob + metadata together: a decode-then-
    // join formulation would scan (and decode) the source twice and
    // shuffle every blob byte through a same-cardinality join — at the
    // advertised scale that shuffle IS the cost. The only exchange here
    // is the write's partitionBy.
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = fakeDecode(id, bytes)
        (id, bytes, m.width, m.height, m.n_bytes, m.sha, m.format)
      })
      .toDF("doc_id", "blob", "width", "height", "n_bytes", "sha", "format")
      .write.partitionBy("format").mode("overwrite").parquet(dir)
  }

  /** Format-pruned read over a [[writeMediaLake]] layout. */
  def readFormat(spark: org.apache.spark.sql.SparkSession, dir: String,
      format: String): DataFrame =
    spark.read.parquet(dir).filter(col("format") === format)
}
