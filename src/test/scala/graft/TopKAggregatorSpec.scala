package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.plans.GraftFunctions

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("bounded-heap top-k equals the window row_number formulation on Q25's pairs") {
    val t = sf0001
    val emb = t.embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = emb.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("e").as("qe"))
    val pairs = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        GraftFunctions.cosineSimilarity(col("qe"), col("e")).as("sim"))

    // window path (the declared Q25 shape)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    val viaWindow = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "vec_id", "sim")
      .as[(Long, Long, Double)].collect().toSet

    // aggregator path (bounded heap, no per-group sort of all candidates)
    val topk = udaf(new TopKAggregator(5))
    val viaAgg = pairs
      .groupBy("qid")
      .agg(topk(col("sim"), col("vec_id")).as("top"))
      .select(col("qid"), explode(col("top")).as("p"))
      .select(col("qid"), col("p.id").as("vec_id"), col("p.score").as("sim"))
      .as[(Long, Long, Double)].collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("partial aggregation works: result invariant under repartitioning") {
    val data = (1 to 10000).map(i => ((i % 7).toLong, (i * 37 % 10007).toDouble, i.toLong))
      .toDF("g", "score", "id")
    val topk = udaf(new TopKAggregator(3))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
        .as[(Long, Seq[TopKAggregator.Scored])].collect().toMap
    assert(run(data) == run(data.repartition(17)))
  }

  test("ties on score break by ascending id, like the window ORDER BY") {
    val data = Seq((1L, 5.0, 30L), (1L, 5.0, 10L), (1L, 5.0, 20L), (1L, 4.0, 1L))
      .toDF("g", "score", "id")
    val topk = udaf(new TopKAggregator(2))
    val top = data.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .as[(Long, Seq[TopKAggregator.Scored])].head()._2
    assert(top == Seq(TopKAggregator.Scored(5.0, 10L), TopKAggregator.Scored(5.0, 20L)))
  }
}
