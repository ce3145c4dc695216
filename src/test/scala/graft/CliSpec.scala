package graft

import java.nio.file.Files

/** Drives the shadems-equivalent CLI end-to-end on fixture data. */
class CliSpec extends SparkSpec {

  private def tmp(name: String) =
    Files.createTempDirectory("cli").resolve(name).toString

  test("flagship: auto-ranged eq_hist plot with png + raster outputs") {
    val png = tmp("plot.png")
    val out = tmp("raster")
    val cells = Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
      "-x", "l_quantity", "-y", "l_extendedprice",
      "--width", "64", "--height", "64",
      "--png", png, "--out", out), spark)
    assert(cells > 0)
    assert(new java.io.File(png).length() > 0)
    val raster = spark.read.parquet(out)
    assert(raster.count() == cells)
    assert(raster.columns.toSeq == Seq("xb", "yb", "c", "shade"))
  }

  test("derived-expression axes with --where and explicit ranges (amp analog)") {
    val out = tmp("amp")
    val cells = Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
      "-x", "sqrt(l_discount*l_discount + l_tax*l_tax)", "-y", "l_quantity",
      "--where", "l_orderkey % 2 = 0",
      "--xmin", "0", "--xmax", "0.2", "--ymin", "0", "--ymax", "50",
      "--width", "32", "--height", "32", "--out", out), spark)
    assert(cells > 0 && cells <= 32L * 32L)
  }

  test("categorical colour-by composite png") {
    val png = tmp("cat.png")
    val cells = Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
      "-x", "l_quantity", "-y", "l_extendedprice",
      "--colour-by", "l_returnflag",
      "--width", "16", "--height", "16", "--png", png), spark)
    assert(cells > 0)
    assert(new java.io.File(png).length() > 0)
  }

  test("--ared mean reduction and --iter per-group partitioned output") {
    val out = tmp("iter")
    val cells = Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
      "-x", "l_quantity", "-y", "l_extendedprice",
      "--aaxis", "l_tax", "--ared", "mean",
      "--iter", "l_linestatus",
      "--width", "16", "--height", "16", "--out", out), spark)
    assert(cells > 0)
    val groups = new java.io.File(out).listFiles.map(_.getName)
      .filter(_.startsWith("grp=")).toSet
    assert(groups == Set("grp=F", "grp=O"))
    assert(spark.read.parquet(out).columns.contains("ared"))
  }

  test("--iter with --png writes one PNG per group") {
    val out = tmp("iterpng")
    val png = tmp("iter_{}.png")
    val cells = Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
      "-x", "l_quantity", "-y", "l_extendedprice",
      "--iter", "l_linestatus",
      "--width", "16", "--height", "16", "--out", out, "--png", png), spark)
    assert(cells > 0)
    for (g <- Seq("F", "O")) {
      val f = new java.io.File(png.replace("{}", g))
      assert(f.length() > 0, s"per-group png for $g must be written")
    }
    // without a {} token the group lands before the extension
    assert(graft.operators.ShadePlot.pngPathForGroup("/tmp/a/p.png", "O") == "/tmp/a/p_O.png")
    assert(graft.operators.ShadePlot.pngPathForGroup("/tmp/a.dir/p", "O") == "/tmp/a.dir/p_O")
    // a sanitized group value gets a short hash of the ORIGINAL value so
    // distinct groups can never collapse onto one filename
    assert(graft.operators.ShadePlot.pngPathForGroup("/t/p.png", "x y") == "/t/p_x_y-c8d1ae92.png")
    assert(graft.operators.ShadePlot.pngPathForGroup("/t/p.png", "a/b") !=
      graft.operators.ShadePlot.pngPathForGroup("/t/p.png", "a_b"))
    assert(graft.operators.ShadePlot.pngPathForGroup("/t/p.png", "a b") !=
      graft.operators.ShadePlot.pngPathForGroup("/t/p.png", "a/b"))
  }

  test("misspelled options, order-less first/last, and partial ranges are handled") {
    intercept[IllegalArgumentException](Cli.parse(Seq("--widht", "64")))
    intercept[IllegalArgumentException] {
      Cli.run(Seq(
        "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
        "-x", "l_quantity", "-y", "l_extendedprice",
        "--aaxis", "l_tax", "--ared", "first",
        "--width", "8", "--height", "8"), spark)
    }
    // a partial range must be honored, not silently dropped: clamp x to
    // a narrow window and the x-bins collapse accordingly
    val out = tmp("partial")
    Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
      "-x", "l_quantity", "-y", "l_extendedprice",
      "--xmin", "0", "--xmax", "1",
      "--width", "8", "--height", "8", "--out", out), spark)
    val xbs = spark.read.parquet(out).select("xb").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(xbs.subsetOf(Set(0, 7)),
      s"with x clamped to [0,1), quantities >= 1 must pile into the edge bins, got $xbs")
  }

  test("events table works through the CLI (nanos normalization inside Engine.open)") {
    val out = tmp("events")
    val cells = Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "events",
      "-x", "unix_micros(ts) / 1000000.0", "-y", "value",
      "--width", "32", "--height", "32", "--out", out), spark)
    assert(cells > 0)
  }

  test("--sample draws a deterministic subset; reruns identical, fewer points than full") {
    def total(out: String, extra: Seq[String]): Double = {
      Cli.run(Seq(
        "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
        "-x", "l_quantity", "-y", "l_extendedprice",
        "--xmin", "0", "--xmax", "55", "--ymin", "900", "--ymax", "105000",
        "--width", "32", "--height", "32", "--out", out) ++ extra, spark)
      spark.read.parquet(out).agg(org.apache.spark.sql.functions.sum("c"))
        .head().getLong(0).toDouble
    }
    val full = total(tmp("full"), Seq.empty)
    val s1 = total(tmp("s1"), Seq("--sample", "0.3", "--sample-key",
      "concat(l_orderkey, ':', l_linenumber)"))
    val s2 = total(tmp("s2"), Seq("--sample", "0.3", "--sample-key",
      "concat(l_orderkey, ':', l_linenumber)"))
    assert(s1 == s2, "the sample must be identical across runs")
    assert(s1 > 0 && s1 < full, s"sampled points $s1 must be a strict subset of $full")
    assert(math.abs(s1 / full - 0.3) < 0.05, s"fraction off: ${s1 / full}")
    val e = intercept[IllegalArgumentException] {
      Cli.run(Seq("--dir", "/root/testdata/sf0.001", "--table", "lineitem",
        "-x", "l_quantity", "-y", "l_extendedprice", "--sample", "0.5"), spark)
    }
    assert(e.getMessage.contains("sample-key"))
  }
}
