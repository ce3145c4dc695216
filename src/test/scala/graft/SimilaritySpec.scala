package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two clear clusters around the two axis-aligned centroids 0 and 1
  private val vecs = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),            // centroids
    (10L, Seq(0.9, 0.1)), (11L, Seq(0.95, 0.05)),        // cluster of 0
    (20L, Seq(0.1, 0.9)), (21L, Seq(0.05, 0.95))         // cluster of 1
  ).toDF("vec_id", "e")

  test("ivfAssign puts each vector in its obvious cluster") {
    val assign = Similarity.ivfAssign(vecs, vecs.filter(col("vec_id") < 2))
      .as[(Long, Long)].collect().toMap
    assert(assign(10L) == 0L && assign(11L) == 0L)
    assert(assign(20L) == 1L && assign(21L) == 1L)
    assert(assign(0L) == 0L && assign(1L) == 1L)
  }

  test("trainCentroids converges to the cluster means on the toy set") {
    val trained = Similarity.trainCentroids(vecs, k = 2, iters = 3, dim = 2)
      .as[(Long, Seq[Double])].collect().toMap
    // cluster of axis-x: {(1,0),(0.9,0.1),(0.95,0.05)} → mean (0.95, 0.05)
    val c0 = trained(0L)
    val c1 = trained(1L)
    assert(math.abs(c0(0) - 0.95) < 1e-9 && math.abs(c0(1) - 0.05) < 1e-9)
    assert(math.abs(c1(0) - 0.05) < 1e-9 && math.abs(c1(1) - 0.95) < 1e-9)
    // trained centroids still drive ivfAssign correctly
    val assign = Similarity.ivfAssign(vecs, trained.toSeq.toDF("vec_id", "e"))
      .as[(Long, Long)].collect().toMap
    assert(assign(10L) == 0L && assign(21L) == 1L)
  }

  test("ivfTopK searches only the query's bucket") {
    val assign = Similarity.ivfAssign(vecs, vecs.filter(col("vec_id") < 2))
    val out = Similarity.ivfTopK(vecs, assign, vecs.filter(col("vec_id") === 10L), k = 5)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    // bucket 0 contains {0, 10, 11}: neighbors of 10 are 0 and 11, never cluster 1
    assert(out == Set((10L, 0L), (10L, 11L)))
  }
}
