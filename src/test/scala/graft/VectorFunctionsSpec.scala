package graft

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot on hand values") {
    val d = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(V.dot(col("a"), col("b"))).as[Double].head()
    assert(d == 32.0)
  }

  test("normalize, distances, centroid aggregation") {
    val df = Seq((Seq(3.0, 4.0), Seq(0.0, 0.0)), (Seq(1.0, 0.0), Seq(4.0, 4.0))).toDF("a", "b")
    val norms = df.select(V.normSq(V.normalize(col("a"))).as("n")).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
    val d = df.select(V.euclidean(col("a"), col("b")).as("d")).as[Double].collect()
    assert(d(0) == 5.0 && math.abs(d(1) - 5.0) < 1e-12)
    val centroid = df.agg(V.meanVector(col("a"), 2).as("c"))
      .as[Seq[Double]].head()
    assert(centroid == Seq(2.0, 2.0))
  }

  test("cosine identities on 200 seeded random vector pairs: sim(a,a)=1, symmetry, |sim| <= 1") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((
      Seq.fill(16)(rnd.nextDouble() * 2 - 1),
      Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val rows = pairs.toDF("a", "b").select(
      V.cosineSimilarity(col("a"), col("a")).as("saa"),
      V.cosineSimilarity(col("a"), col("b")).as("sab"),
      V.cosineSimilarity(col("b"), col("a")).as("sba"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (saa, sab, sba) =>
      assert(math.abs(saa - 1.0) < 1e-12)
      assert(sab == sba, "cosine must be exactly symmetric (same fold order)")
      assert(math.abs(sab) <= 1.0 + 1e-12)
    }
  }
}
