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

  test("zValue2 reproduces the Morton curve exactly on a 4x4 grid") {
    // the canonical Z traversal: x bits at even positions, y at odd
    val want = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (0, 1) -> 2L, (1, 1) -> 3L,
      (2, 0) -> 4L, (3, 0) -> 5L, (2, 1) -> 6L, (3, 1) -> 7L,
      (0, 2) -> 8L, (1, 2) -> 9L, (0, 3) -> 10L, (1, 3) -> 11L,
      (2, 2) -> 12L, (3, 2) -> 13L, (2, 3) -> 14L, (3, 3) -> 15L)
    val grid = want.keys.toSeq.map { case (x, y) => (x, y) }.toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
        Layout.zValue2(col("x"), col("y"), bits = 2).as("z"))
      .as[(Int, Int, Long)].collect()
      .map { case (x, y, z) => (x, y) -> z }.toMap
    assert(got == want, s"got $got")
  }

  test("zOrdered partitions cover disjoint ascending z-ranges (stats-prunable files)") {
    val pts = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    val z = Layout.zOrdered(pts, col("x"), col("y"), bits = 5, partitions = 8)
    val ranges = z
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"), col("__z"))
      .groupBy("p").agg(min("__z").as("lo"), max("__z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(ranges.length > 1)
    // each output partition owns one compact z interval, strictly after
    // the previous partition's — exactly what lets per-file min/max
    // stats prune range predicates on either source dimension
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, ranges.toSeq)
      case _ => ()
    }
  }

  /** Independent reference model: the textbook d→(x,y) Hilbert inverse
    * (iterative, bottom-up) — the operator must invert it exactly. */
  private def hilbertD2xy(n: Int, dIn: Int): (Int, Int) = {
    var t = dIn; var x = 0; var y = 0; var s = 1
    while (s < n) {
      val rx = 1 & (t / 2)
      val ry = 1 & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4; s *= 2
    }
    (x, y)
  }

  test("hilbertValue2 inverts the textbook d2xy walk exactly (bits 2 and 3)") {
    for (bits <- Seq(2, 3)) {
      val n = 1 << bits
      val want = (0 until n * n).map(d => hilbertD2xy(n, d) -> d.toLong).toMap
      val grid = want.keys.toSeq.toDF("x", "y")
      val got = grid.select(col("x"), col("y"),
          Layout.hilbertValue2(col("x"), col("y"), bits).as("h"))
        .as[(Int, Int, Long)].collect()
        .map { case (x, y, h) => (x, y) -> h }.toMap
      assert(got == want, s"bits=$bits: got $got")
      // the property Morton lacks: CONSECUTIVE curve positions are
      // grid-adjacent (the d2xy walk is a manhattan-1 path)
      (1 until n * n).foreach { d =>
        val (x0, y0) = hilbertD2xy(n, d - 1); val (x1, y1) = hilbertD2xy(n, d)
        assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1, s"jump at d=$d")
      }
    }
  }

  test("hilbertValue2 (native) matches d2xy on the FULL bits=8 grid — the gated width " +
      "that broke the r15 bench as a Column tree") {
    val n = 1 << 8
    val want = (0 until n * n).map(d => hilbertD2xy(n, d) -> d.toLong).toMap
    val grid = want.keys.toSeq.toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
        Layout.hilbertValue2(col("x"), col("y"), 8).as("h"))
      .as[(Int, Int, Long)].collect()
      .map { case (x, y, h) => (x, y) -> h }.toMap
    assert(got == want)
  }

  test("hilbertValue2Unrolled (Column cross-check form) ≡ native at bits 1..5, full grids") {
    for (bits <- 1 to 5) {
      val n = 1 << bits
      val grid = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
      val mismatches = grid.select(
          Layout.hilbertValue2(col("x"), col("y"), bits).as("native"),
          Layout.hilbertValue2Unrolled(col("x"), col("y"), bits).as("unrolled"))
        .filter(col("native") =!= col("unrolled")).count()
      assert(mismatches == 0L, s"bits=$bits: $mismatches cells disagree")
    }
    // the cross-check form refuses widths where its tree would explode
    intercept[IllegalArgumentException] {
      Layout.hilbertValue2Unrolled(col("x"), col("y"), bits = 8)
    }
  }

  test("hilbertValue2 at bits=31 (the widened limit): positive, injective, partition-invariant") {
    // d < 4^31 = 2^62 must stay a positive long at the full grid corners
    val m = (1L << 31) - 1
    val pts = Seq((0L, 0L), (m, 0L), (0L, m), (m, m), (123456789L, 987654321L),
      (m / 2, m / 3), (1L, m - 1L)).toDF("x", "y")
    val h = pts.select(col("x"), col("y"),
        Layout.hilbertValue2(col("x"), col("y"), 31).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(h.forall(_._3 >= 0L), s"d must stay positive: ${h.toSeq}")
    assert(h.map(_._3).distinct.length == h.length, "corner cells must map injectively")
    val h2 = pts.repartition(5).select(col("x"), col("y"),
        Layout.hilbertValue2(col("x"), col("y"), 31).as("h"))
      .as[(Long, Long, Long)].collect().toSet
    assert(h2 == h.toSet)
  }

  test("hilbertOrdered partitions cover disjoint ascending curve intervals") {
    val pts = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    val h = Layout.hilbertOrdered(pts, col("x"), col("y"), bits = 5, partitions = 8)
    val ranges = h
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"), col("__h"))
      .groupBy("p").agg(min("__h").as("lo"), max("__h").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, ranges.toSeq)
      case _ => ()
    }
    intercept[IllegalArgumentException] {
      Layout.hilbertValue2(col("x"), col("y"), bits = 32)
    }
  }

  test("seededShuffle: total, contiguous positions, partitioning-independent, seed-sensitive") {
    val docs = sf0001.documents.select("doc_id")
    val n = docs.count()
    def run(df: org.apache.spark.sql.DataFrame, seed: String) =
      graft.operators.Layout.seededShuffle(df, col("doc_id"), seed, nShards = 4)
        .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    val a = run(docs, "epoch0")
    // every row appears exactly once; per-shard positions are 1..size
    assert(a.length == n)
    a.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $s positions not contiguous")
    }
    // identical assignment regardless of input partitioning
    val b = run(docs.repartition(13), "epoch0")
    assert(a.map(r => r._1 -> ((r._2, r._3))).toMap ==
      b.map(r => r._1 -> ((r._2, r._3))).toMap)
    // a different seed is a different permutation (not a shifted copy)
    val c = run(docs, "epoch1")
    val aM = a.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(c.exists(r => aM(r._1) != ((r._2, r._3))), "seed must change the order")
  }

  test("skewAudit reports hot keys with exact shares and ratios, nulls counted") {
    // a × 6, b × 3, c × 1, null × 2 → 4 keys / 12 rows; mean 3, max 6
    val rows = (Seq.fill(6)(Option("a")) ++ Seq.fill(3)(Option("b")) ++
      Seq(Option("c")) ++ Seq.fill(2)(Option.empty[String]))
      .zipWithIndex.map { case (k, i) => (k, i) }
    val got = graft.operators.Layout.skewAudit(
        rows.toDF("k", "v").repartition(5), col("k"), topK = 3)
      .orderBy("rank").collect()
    assert(got.length == 3)
    val top = got.head
    assert(top.getAs[Long]("rank") == 1L && top.getAs[String]("key") == "a")
    assert(top.getAs[Long]("cnt") == 6L)
    assert(top.getAs[Double]("share") == 6.0 / 12)
    assert(top.getAs[Double]("ratio_to_mean") == 6.0 * 4 / 12)
    assert(top.getAs[Long]("n_keys") == 4L && top.getAs[Long]("n_rows") == 12L)
    assert(top.getAs[Double]("max_ratio") == 2.0)
    // rank 2 = the null bucket at cnt 2? No: b (3) beats NULL (2)
    assert(got(1).getAs[String]("key") == "b" && got(1).getAs[Long]("cnt") == 3L)
    assert(got(2).getAs[String]("key") == "NULL" && got(2).getAs[Long]("cnt") == 2L)
    // topK above the key cardinality returns every key, tie-broken by key
    val all = graft.operators.Layout.skewAudit(
        rows.toDF("k", "v"), col("k"), topK = 10).collect()
    assert(all.length == 4)
    assert(all.map(_.getAs[String]("key")).toSeq == Seq("a", "b", "NULL", "c"))
  }

  test("rendezvousShard: matches the brute-force HRW argmax and moves only onto the new shard") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def brute(key: Long, n: Int, seed: String): Long =
      (0 until n).map(s => (md5hex(s"$seed|$key|$s"), s.toLong)).max._2
    val keys = (0L until 400L).toDF("k")
    val assigned = keys.select(col("k"),
        graft.operators.Layout.rendezvousShard(col("k"), 8, "t").as("s8"),
        graft.operators.Layout.rendezvousShard(col("k"), 9, "t").as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact agreement with a driver-side reimplementation, every key
    assigned.foreach { case (k, s8, s9) =>
      assert(s8 == brute(k, 8, "t"), s"key $k: $s8 vs ${brute(k, 8, "t")}")
      assert(s9 == brute(k, 9, "t"), s"key $k: $s9 vs ${brute(k, 9, "t")}")
    }
    // HRW theorem: a key moves IFF the new shard wins, so every mover
    // lands on shard 8 and nothing else changes
    val movers = assigned.filter { case (_, s8, s9) => s8 != s9 }
    assert(movers.nonEmpty && movers.forall(_._3 == 8L),
      s"every mover must land on the new shard: ${movers.take(5).toSeq}")
    // moved mass ~ 1/9 of keys (binomial: mean 44.4, generous 3x band)
    val frac = movers.length.toDouble / assigned.length
    assert(frac > 0.03 && frac < 0.30, s"moved fraction $frac should be near 1/9")
    intercept[IllegalArgumentException](
      graft.operators.Layout.rendezvousShard(col("k"), 0, "t"))
  }
}
