package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on the bucket key") {
    Layout.writeBucketed(sf0001.orders, Seq("o_custkey"), 4, "orders_b")
    Layout.writeBucketed(sf0001.customer
      .withColumn("c_custkey", col("c_custkey")), Seq("c_custkey"), 4, "customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // and it computes the same thing as the plain join
    val plain = sf0001.orders
      .join(sf0001.customer, col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == plain)
  }

  test("saltedJoin equals the plain join on skewed data") {
    // 10k rows all sharing one hot key + a long tail
    val left = (1 to 10000).map(i => (if (i <= 9000) 1L else i.toLong, i))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (9500L, "tail"), (42L, "none")).toDF("k", "name")
    val salted = Layout.saltedJoin(left, right, Seq("k"), saltBuckets = 8)
      .select("k", "v", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
