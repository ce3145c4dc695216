package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 2-D count raster is the reference's core operator
    * (datashader `Canvas.points` ≡ partial+final hash aggregate). */
  def entry(spark: SparkSession): DataFrame =
    Queries.q06(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * north-star extension operators (q31+). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Queries.all ++ ExtensionQueries.all ++ CoverageQueries.all ++ PipelineQueries.all)
      .map { case (name, q) =>
        name -> ((spark: SparkSession, dir: String) => q(Tables(spark, dir)))
      }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every query, q40's real image decode
    * included (its synthesized inputs make the decode SQL-predictable). */
  def oracleSql: Map[String, String] =
    OracleSql.all ++ ExtensionQueries.oracles ++ CoverageQueries.oracles ++
      PipelineQueries.oracles
}
