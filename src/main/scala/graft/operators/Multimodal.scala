package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, processed
  * by a batch-oriented per-partition kernel — the Scala analogue of a
  * vectorized Python `mapInPandas` decode stage.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment): [[decodeStub]] derives deterministic fake media metadata
  * from the raw bytes. Everything around the stub — the binary column
  * schema, the `Dataset` encoder boundary, partition-preserving execution,
  * and the typed output schema — is the real production shape: swap
  * `fakeDecode` for a JNI/codec call and nothing else changes.
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

  /** Media-lake layout: payloads + decoded metadata written as parquet
    * PARTITIONED BY the decoded format. This is the 100 TB shape — binary
    * blobs ride along in parquet pages, metadata columns are scannable
    * without touching blob bytes (column pruning), and a format-filtered
    * read prunes whole directories before any I/O (partition pruning —
    * asserted on the plan in MultimodalSpec). */
  def writeMediaLake(df: DataFrame, idCol: String, blobCol: String, dir: String): Unit = {
    val meta = decodeStub(df, idCol, blobCol).toDF()
    df.select(col(idCol).cast("long").as("doc_id"), col(blobCol).as("blob"))
      .join(meta, "doc_id")
      .write.partitionBy("format").mode("overwrite").parquet(dir)
  }

  /** Format-pruned read over a [[writeMediaLake]] layout. */
  def readFormat(spark: org.apache.spark.sql.SparkSession, dir: String,
      format: String): DataFrame =
    spark.read.parquet(dir).filter(col("format") === format)
}
