package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Formats

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = "/tmp/graft-formats-spec"

  /** The q05-shaped aggregation used as the cross-format probe: every
    * column family (string group key, double measures, timestamp) flows
    * through it. */
  private def probe(df: DataFrame): Map[String, (Long, Double, String)] =
    df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"),
        max(date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")).as("d"))
      .as[(String, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("CSV and JSON-lines roundtrip the lineitem slice bit-for-bit (pinned schema)") {
    val src = sf0001.lineitem
    val want = probe(src)
    Formats.writeCsv(src, s"$tmp/li_csv")
    Formats.writeJsonLines(src, s"$tmp/li_json")
    val schema = Tables.schemas("lineitem")
    assert(probe(Formats.readCsv(spark, s"$tmp/li_csv", schema)) == want)
    assert(probe(Formats.readJsonLines(spark, s"$tmp/li_json", schema)) == want)
  }

  test("FAILFAST surfaces malformed ingest rows instead of nulling them") {
    val dir = s"$tmp/bad_csv"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "a,b\n1,2\nnot_a_number,3\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.IntegerType)))
    intercept[Exception] {
      Formats.readCsv(spark, dir, schema).collect()
    }
    // PERMISSIVE keeps the parseable rows (explicit, not accidental)
    assert(Formats.readCsv(spark, dir, schema, failFast = false)
      .filter(col("a").isNotNull).count() == 1)
  }

  test("CSV roundtrip distinguishes NULL from empty string (sentinel contract)") {
    val df = Seq((1L, Some("text")), (2L, Some("")), (3L, None))
      .toDF("id", "s")
    Formats.writeCsv(df, s"$tmp/nulls_csv")
    val back = Formats.readCsv(spark, s"$tmp/nulls_csv",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))))
      .as[(Long, Option[String])].collect().toMap
    assert(back(1L) == Some("text"))
    assert(back(2L) == Some(""), "empty string must come back empty, not NULL")
    assert(back(3L) == None, "NULL must come back NULL, not empty")
  }

  test("ingest conversion: text drop queried via its columnar copy matches the source") {
    val src = sf0001.lineitem
    Formats.writeCsv(src, s"$tmp/drop_csv")
    val ingested = Formats.readCsv(spark, s"$tmp/drop_csv", Tables.schemas("lineitem"))
    Formats.toParquet(ingested, s"$tmp/home_parquet")
    val home = spark.read.schema(Tables.schemas("lineitem")).parquet(s"$tmp/home_parquet")
    assert(probe(home) == probe(src))
  }

  test("ORC roundtrips and is a first-class query target: filters push into the scan") {
    val src = sf0001.lineitem
    Formats.writeOrc(src, s"$tmp/li_orc")
    val orc = Formats.readOrc(spark, s"$tmp/li_orc", Tables.schemas("lineitem"))
    assert(probe(orc) == probe(src))
    // pushdown evidence: the quantity predicate must reach the ORC reader
    // (PushedFilters on the scan node), same as the parquet plan gates
    val plan = orc.filter(col("l_quantity") > 30.0).select("l_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(l_quantity,30.0)"),
      s"ORC scan must carry the pushed filter, got:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_extendedprice"),
      "column pruning must drop unread columns from the ORC read schema")
  }
}
