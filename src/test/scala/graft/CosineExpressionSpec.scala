package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.plans.GraftFunctions

class CosineExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("native expression is registered and callable from SQL") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS s," +
      "       cosine_similarity(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS t")
      .as[(Double, Double)].head()
    assert(r._1 == 0.0)
    assert(math.abs(r._2 - 1.0) < 1e-15)
  }

  test("native expression is bit-identical to the higher-order-function formulation") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(500)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val diff = pairs.toDF("a", "b").select(
      GraftFunctions.cosineSimilarity(col("a"), col("b")).as("native"),
      V.cosineSimilarity(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0, "native and HOF cosine must agree on every bit")
  }

  test("mismatched lengths and null elements yield null, not truncated similarity") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 2.0d), array(1.0d)) AS mism," +
      "       cosine_similarity(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS nel")
      .head()
    assert(r.isNullAt(0), "length mismatch must be null")
    assert(r.isNullAt(1), "null element must be null")
  }

  test("null inputs yield null") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d))").head()
    assert(r.isNullAt(0))
  }
}
