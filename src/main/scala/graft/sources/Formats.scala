package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format ingest/egress (SURVEY §2.1 breadth beyond parquet).
  *
  * The reference reads one storage format (casacore MS via dask-ms [U]);
  * a lake-scale pipeline additionally lands CSV and JSON-lines drops from
  * upstream producers. Two rules keep these sources scale-safe:
  *
  *  - **always pin the schema**: schema inference reads the data twice
  *    (a full pre-scan at 100 TB) and silently drifts when a new file's
  *    values parse differently; an explicit StructType is one driver-side
  *    object and makes bad rows fail loudly (`mode=FAILFAST`) or land in
  *    a corrupt-record column (`PERMISSIVE`) by *choice*, not by accident;
  *  - **text formats are an ingest edge, not a home**: no column pruning,
  *    no predicate pushdown into the decoder, 3–10× the bytes of parquet.
  *    Convert once on ingest ([[toParquet]]) and run queries against the
  *    columnar copy.
  */
object Formats {

  /** CSV cannot natively distinguish an empty string from NULL (both are
    * an empty field), so writer and reader agree on a convention: NULL is
    * an explicit `\N` sentinel, the empty string is written QUOTED (`""`)
    * and read back with the default empty-value mapping. A genuine `\N`
    * string value in the data would be read back as NULL (the classic
    * tradeoff; pick a different sentinel if your corpus can contain it).
    * Roundtrip of text/empty/NULL pinned in FormatsSpec. */
  private val NullSentinel = "\\N"
  private val QuotedEmpty = "\"\""

  /** CSV with header, ISO-8601 timestamps, explicit schema. FAILFAST by
    * default: a malformed row at ingest is a producer bug to surface, not
    * a row to silently null out. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
      .option("nullValue", NullSentinel)
      .option("emptyValue", "")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .option("nullValue", NullSentinel)
      .option("emptyValue", QuotedEmpty)
      .csv(path)

  /** JSON-lines with explicit schema (no inference pre-scan). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(path)

  /** One-shot ingest conversion: text drop → columnar home. */
  def toParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC — the OTHER columnar home (native in Spark, no extra module):
    * a lake inherited from a Hive/Trino estate often lands ORC, and
    * unlike the text edges it is a first-class query target — column
    * pruning and predicate pushdown reach the ORC reader exactly as
    * they do parquet (`PushedFilters` in the scan node, asserted in
    * FormatsSpec), so no ingest conversion is required to query it
    * efficiently. Schema is still pinned on read: ORC footers carry
    * types, but pinning keeps the same loud-drift contract as
    * [[readCsv]]/[[readJsonLines]] ([[graft.Tables.assertSchemasMatch]]
    * discipline). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
