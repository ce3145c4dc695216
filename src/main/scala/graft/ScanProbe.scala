package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Cleaning, Dedup}

// temporary diagnostic — deleted before commit
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val cleaned = Cleaning.clean(docs, col("text"))
    val pairs = Dedup.minHashNearDups(cleaned, col("doc_id"), col("text"))
    val deduped = Dedup.withPairs(pairs) { p =>
      Dedup.dropNearDups(cleaned, col("doc_id"), p)
    }
    for (mr <- Seq(3, 4, 5, 6, 8)) {
      val n = Dedup.duplicatedSpans(deduped, col("doc_id"), col("text"), minRun = mr).count()
      println(s"PROBE minRun=$mr spans=$n")
    }
    spark.stop()
  }
}
