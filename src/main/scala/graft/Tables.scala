package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog over one testdata scale-factor directory.
  *
  * Plays the role of the reference's table-open + metadata step
  * (`shade_ms/ms_info.py :: MSInfo`, `shade_ms/data_plots.py ::
  * get_plot_data` [U]): open the main fact tables plus the small dimension
  * tables. Column pruning and predicate pushdown are left to Catalyst — the
  * parquet scan only reads what downstream plans reference, which is the
  * Spark-native analogue of `xds_from_ms(columns=..., taql=...)`.
  *
  * All loads are lazy `DataFrame`s: nothing is read until an action runs.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  lazy val region: DataFrame    = load("region")
  lazy val nation: DataFrame    = load("nation")
  lazy val customer: DataFrame  = load("customer")
  lazy val supplier: DataFrame  = load("supplier")
  lazy val part: DataFrame      = load("part")
  lazy val orders: DataFrame    = load("orders")
  lazy val lineitem: DataFrame  = load("lineitem")
  lazy val documents: DataFrame = load("documents")
  lazy val embeddings: DataFrame = load("embeddings")

  /** `events.parquet` carries `TIMESTAMP(NANOS)`, which Spark 4.x refuses to
    * read natively (`[PARQUET_TYPE_ILLEGAL]`). Read nanos as long and
    * truncate to microseconds with integer division — exact, because the
    * generator emits µs-precision values (FIXTURES.md hazard #1; verified
    * equal to DuckDB's native read of the same file).
    */
  lazy val events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load("events").withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
}
