package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + catalog facade: the engine's "open the Measurement Set" entry
  * point (`shade_ms/main.py :: main` opening the MS and `MSInfo` building
  * the catalog [U]).
  *
  * [[Engine.session]] builds a SparkSession with the configs the engine
  * depends on (UTC, nanos-as-long, graft native functions registered via
  * the extensions mechanism). [[Engine.open]] loads a scale-factor
  * directory and registers every table as a temp view, which gives users
  * free-form `spark.sql(...)` over the catalog — the analogue of the
  * reference's `--taql` arbitrary-predicate passthrough, except the whole
  * query surface is open, not just WHERE.
  */
object Engine {

  def session(
      master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.plans.GraftFunctions.ensureRegistered(spark)
    spark
  }

  /** Open a data directory as a catalog: loads all tables (events
    * normalized) and registers them as temp views for SQL access. */
  def open(spark: SparkSession, dir: String): Tables = {
    val t = Tables(spark, dir)
    Tables.schemas.keys.foreach {
      case "events" => t.events.createOrReplaceTempView("events")
      case name =>
        val df: DataFrame = name match {
          case "region" => t.region;     case "nation" => t.nation
          case "customer" => t.customer; case "supplier" => t.supplier
          case "part" => t.part;         case "orders" => t.orders
          case "lineitem" => t.lineitem; case "documents" => t.documents
          case "embeddings" => t.embeddings
        }
        df.createOrReplaceTempView(name)
    }
    t
  }
}
