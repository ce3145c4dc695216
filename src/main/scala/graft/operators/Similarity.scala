package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.plans.GraftFunctions

/** Similarity search over embedding columns (north-star extension).
  *
  * Brute-force top-k (the Q25 baseline) broadcasts the query set and scans
  * the corpus once — right up to millions of query·corpus pairs. The IVF
  * variant is the scale path: vectors are bucketed by nearest centroid and
  * a query only scans its own bucket, so the per-query work drops by the
  * number of partitions (classic inverted-file ANN); at 100 TB the
  * assignment is a broadcast join against the (small) centroid set and the
  * search is an equi-join on `cid` — both shuffle-light.
  */
object Similarity {

  /** Assign every vector to its nearest centroid by cosine (deterministic
    * tie-break on centroid id): (vec_id, cid). `centroids` must be small —
    * it is broadcast. */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val c = centroids.select(col("vec_id").as("cid"), col("e").as("ce"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
    vectors.join(broadcast(c))
      .select(col("vec_id"), col("cid"), GraftFunctions.cosineSimilarity(col("e"), col("ce")).as("csim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "cid")
  }

  /** Deterministic Lloyd's iterations for IVF centroid training: init =
    * the first k vectors by id, fixed iteration count, cosine assignment.
    * Only the k-row centroid set ever reaches the driver; each iteration
    * is one broadcast-join assignment pass + one k-group mean aggregate —
    * the standard distributed k-means shape. Returns (vec_id, e) rows
    * usable directly as [[ivfAssign]]'s centroid input. */
  def trainCentroids(vectors: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    var cents: Seq[(Long, Seq[Double])] = vectors.orderBy("vec_id").limit(k)
      .select(col("e").cast("array<double>")).as[Seq[Double]].collect()
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    for (_ <- 0 until iters) {
      val cDf = cents.toDF("vec_id", "e")
      val assign = ivfAssign(vectors, cDf)
      cents = vectors.join(assign, "vec_id")
        .groupBy(col("cid"))
        .agg(V.meanVector(col("e"), dim).as("e"))
        .select(col("cid"), col("e")).as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    }
    cents.toDF("vec_id", "e")
  }

  /** IVF top-k: each query searches only the vectors assigned to its own
    * centroid bucket. Returns (qid, vec_id, sim, rn) with rn ≤ k. */
  def ivfTopK(
      vectors: DataFrame, assign: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(vectors.sparkSession)
    val q = queries.join(assign, "vec_id")
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("cid").as("qc"))
    val bucket = assign.select(col("vec_id"), col("cid").as("qc"))
      .join(vectors, "vec_id")
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    broadcast(q).join(bucket, "qc")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), GraftFunctions.cosineSimilarity(col("qe"), col("e")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
