package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Canvas, ShadePlot}
import graft.operators.ShadePlot.PlotSpec

class ShadePlotSpec extends SparkSpec {

  private def spec(norm: String = "eq_hist", conj: Boolean = false) = PlotSpec(
    x = col("l_quantity"), y = col("l_extendedprice"),
    canvas = Canvas(32, 32, (0.0, 50.0), (900.0, 105000.0)),
    flagMask = Some(col("l_returnflag") === "R"),
    conjugate = conj, norm = norm)

  test("end-to-end plot: raster → shade → png, deterministic") {
    val png = Files.createTempDirectory("shade").resolve("plot.png").toString
    val shaded = ShadePlot.plot(sf0001.lineitem, spec(), png)
    assert(new java.io.File(png).length() > 0, "png written")
    val rows = shaded.collect()
    assert(rows.nonEmpty && rows.forall { r =>
      val s = r.getAs[Double]("shade"); s > 0.0 && s <= 1.0
    })
    // flag mask applied: raster count excludes 'R' rows
    val total = rows.map(_.getAs[Long]("c")).sum
    assert(total == sf0001.lineitem.filter(col("l_returnflag") =!= "R").count())
  }

  test("decorated png: layout, colorbar = colormap, bitmap text, byte-determinism") {
    import graft.operators.PixelFont
    import javax.imageio.ImageIO
    val dir = Files.createTempDirectory("shade-dec")
    val s = spec()
    val shaded = ShadePlot.shade(ShadePlot.raster(sf0001.lineitem, s), s)
    val p1 = dir.resolve("a.png").toString
    val p2 = dir.resolve("b.png").toString
    ShadePlot.writePngDecorated(shaded, s, p1, title = "lineitem qty vs price")
    ShadePlot.writePngDecorated(shaded, s, p2, title = "lineitem qty vs price")
    val b1 = Files.readAllBytes(java.nio.file.Paths.get(p1))
    assert(java.util.Arrays.equals(b1, Files.readAllBytes(java.nio.file.Paths.get(p2))),
      "decorated output must be byte-deterministic (bitmap font, no AWT text)")
    val img = ImageIO.read(new java.io.File(p1))
    // layout: left grows to fit the widest y label (+8 px of tick/gap
    // budget; floor 50) — this fixture's "1.05e+05" is 47 px, so
    // left = 55; top 13 (titled), bottom 16, right = 4+10+3+width("0.0")+3
    def fmt(v: Double) = "%.3g".formatLocal(java.util.Locale.ROOT, v)
    val yLabs = Seq(fmt(105000.0), fmt(900.0 + 0.5 * (105000.0 - 900.0)), fmt(900.0))
    val left = math.max(50, yLabs.map(PixelFont.width(_)).max + 8)
    assert(left == 55, s"fixture expects a 47-px widest y label, got $yLabs")
    val (top, cbGap, cbW) = (13, 4, 10)
    val right = cbGap + cbW + 3 + PixelFont.width("0.0") + 3
    assert(img.getWidth == left + 32 + right && img.getHeight == top + 32 + 16,
      s"unexpected canvas: ${img.getWidth}x${img.getHeight}")
    // colorbar samples the colormap exactly: top row v=1.0, middle v~0.5
    def rgb(v: Double) = {
      val (r, g, b) = ShadePlot.colormap("fire")(v); (r << 16) | (g << 8) | b
    }
    assert((img.getRGB(left + 32 + cbGap + 1, top) & 0xFFFFFF) == rgb(1.0))
    assert((img.getRGB(left + 32 + cbGap + 1, top + 31) & 0xFFFFFF) == rgb(0.0))
    assert((img.getRGB(left + 32 + cbGap + 1, top + 16) & 0xFFFFFF) ==
      rgb((31 - 16).toDouble / 31))
    // the title row and both tick-label margins contain ink pixels
    def inkIn(x0: Int, x1: Int, y0: Int, y1: Int) =
      (x0 until x1).exists(x => (y0 until y1).exists(y =>
        (img.getRGB(x, y) & 0xFFFFFF) == 0x202020))
    assert(inkIn(0, img.getWidth, 0, top), "title text expected")
    assert(inkIn(0, left, top, top + 32), "y tick labels expected")
    assert(inkIn(0, img.getWidth, top + 32, img.getHeight), "x tick labels expected")
  }

  test("decorated png: y labels wider than the default margin never overdraw the raster") {
    import graft.operators.PixelFont
    import javax.imageio.ImageIO
    // ymin = -105000 → widest label "-1.05e+05" (9 chars, 53 px): under
    // a FIXED 50-px margin this clamped to x=0 and painted ink over the
    // raster's left columns; the margin must grow instead
    val dir = Files.createTempDirectory("shade-dec-wide")
    val s = PlotSpec(
      x = col("l_quantity"), y = col("l_extendedprice"),
      canvas = Canvas(32, 32, (0.0, 50.0), (-105000.0, 105000.0)),
      flagMask = None, conjugate = false, norm = "eq_hist")
    val shaded = ShadePlot.shade(ShadePlot.raster(sf0001.lineitem, s), s)
    val png = dir.resolve("wide.png").toString
    ShadePlot.writePngDecorated(shaded, s, png)
    val img = ImageIO.read(new java.io.File(png))
    val left = math.max(50, PixelFont.width("-1.05e+05") + 8)
    assert(left == 61 && img.getWidth == left + 32 + 4 + 10 + 3 + PixelFont.width("0.0") + 3,
      s"margin must fit the widest label: ${img.getWidth}")
    // no ink (0x202020 label pixels) anywhere inside the raster area
    val top = 4
    val overdrawn = for {
      x <- left until left + 32; y <- top until top + 32
      if (img.getRGB(x, y) & 0xFFFFFF) == 0x202020
    } yield (x - left, y - top)
    assert(overdrawn.isEmpty, s"labels overdraw raster cells at: $overdrawn")
  }

  test("decorated png: byte-identical under tr_TR/de_DE default locales; raster region = writePng") {
    import javax.imageio.ImageIO
    // the two locale hazards this render had: default-locale %g prints
    // decimal COMMAS on de_DE, and default-locale toUpperCase maps 'i'
    // to dotted İ (no glyph) on tr_TR — both must be pinned to ROOT so
    // the bytes cannot depend on the machine
    val dir = Files.createTempDirectory("shade-locale")
    val s = spec()
    val shaded = ShadePlot.shade(ShadePlot.raster(sf0001.lineitem, s), s)
    def render(name: String): Array[Byte] = {
      val p = dir.resolve(name).toString
      ShadePlot.writePngDecorated(shaded, s, p, title = "lineitem qty vs price")
      Files.readAllBytes(java.nio.file.Paths.get(p))
    }
    val home = java.util.Locale.getDefault
    val base = render("default.png")
    try {
      for (l <- Seq(new java.util.Locale("tr", "TR"), java.util.Locale.GERMANY)) {
        java.util.Locale.setDefault(l)
        assert(java.util.Arrays.equals(base, render(s"${l.getLanguage}.png")),
          s"decorated bytes must not depend on the default locale ($l)")
      }
    } finally java.util.Locale.setDefault(home)
    // and the raster area is drawn by the SAME blit as writePng: the
    // decorated page's raster region must match the plain render
    // pixel-for-pixel (offset by the margins)
    val plainPath = dir.resolve("plain.png").toString
    ShadePlot.writePng(shaded, s, plainPath)
    val plain = ImageIO.read(new java.io.File(plainPath))
    val dec = ImageIO.read(new java.io.File(dir.resolve("default.png").toFile.getPath))
    val (left, top) = (55, 13) // this fixture's margins (see layout test)
    val diffs = for {
      x <- 0 until 32; y <- 0 until 32
      if (plain.getRGB(x, y) & 0xFFFFFF) != (dec.getRGB(left + x, top + y) & 0xFFFFFF)
    } yield (x, y)
    assert(diffs.isEmpty, s"raster regions diverged at: ${diffs.take(5)}")
  }

  test("PixelFont: glyphs draw the exact table pixels, clipped at edges") {
    import graft.operators.PixelFont
    val img = new java.awt.image.BufferedImage(16, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    PixelFont.draw(img, 1, 1, "1", 0xFF0000)
    val lit = (for { x <- 0 until 16; y <- 0 until 9
                     if (img.getRGB(x, y) & 0xFFFFFF) == 0xFF0000 } yield (x - 1, y - 1)).toSet
    val want = Set((2, 0), (1, 1), (2, 1), (2, 2), (2, 3), (2, 4), (2, 5),
      (1, 6), (2, 6), (3, 6))
    assert(lit == want, s"glyph '1' pixels: $lit")
    assert(PixelFont.width("0.5") == 17)
    // clipping: drawing off-canvas must not throw
    PixelFont.draw(img, 14, 7, "XY", 0x00FF00)
  }

  test("pngPathForGroup: sanitized-but-distinct groups never collide") {
    // "a/b" and "a_b" both sanitize to "a_b"; the original-value hash
    // suffix keeps them distinct (a collision silently overwrites a PNG)
    val paths = Seq("a/b", "a_b", "a b").map(g =>
      ShadePlot.pngPathForGroup("/tmp/out/{}.png", g))
    assert(paths.distinct.size == paths.size, s"collision: $paths")
    // values that are already filesystem-safe keep their clean name
    assert(ShadePlot.pngPathForGroup("/tmp/out/{}.png", "scan-3.corr")
      == "/tmp/out/scan-3.corr.png")
  }

  test("norms: linear/log/cbrt shades are max-normalized to 1") {
    for (n <- Seq("linear", "log", "cbrt")) {
      val shaded = ShadePlot.shade(ShadePlot.raster(sf0001.lineitem, spec(n)), spec(n))
      val maxShade = shaded.agg(max("shade")).head().getDouble(0)
      assert(maxShade == 1.0, s"norm $n must peak at 1.0")
    }
  }

  test("rasterByGroup computes all per-group rasters in one pass") {
    val grouped = ShadePlot.rasterByGroup(sf0001.lineitem, spec(), col("l_linestatus"))
    val groups = grouped.select("grp").distinct().collect().map(_.getString(0)).toSet
    assert(groups == Set("F", "O"))
    // group rasters sum to the ungrouped raster
    val sumGrouped = grouped.agg(sum("c")).head().getLong(0)
    val ungrouped = ShadePlot.raster(sf0001.lineitem, spec()).agg(sum("c")).head().getLong(0)
    assert(sumGrouped == ungrouped)
  }

  test("reduction aggregates resolve against source columns (--ared)") {
    val s = spec().copy(reduction = Seq(
      round(avg(col("l_tax")), 6).as("m"), max(col("l_discount")).as("mx")))
    val r = ShadePlot.raster(sf0001.lineitem, s)
    assert(r.columns.toSeq == Seq("xb", "yb", "c", "m", "mx"))
    assert(r.count() > 0)
    // conjugate + reduction together also works now
    val rc = ShadePlot.raster(sf0001.lineitem, s.copy(conjugate = true))
    assert(rc.agg(sum("c")).head().getLong(0) == 2 * r.agg(sum("c")).head().getLong(0))
  }

  test("writeRastersPartitioned: one pruned partition per group on disk") {
    val dir = java.nio.file.Files.createTempDirectory("rasters").toString
    ShadePlot.writeRastersPartitioned(sf0001.lineitem, spec(), col("l_linestatus"), dir)
    val parts = new java.io.File(dir).listFiles.map(_.getName).filter(_.startsWith("grp="))
    assert(parts.toSet == Set("grp=F", "grp=O"))
    // reading one group prunes to that partition and matches the one-pass result
    val f = spark.read.parquet(dir).filter(col("grp") === "F").agg(sum("c")).head().getLong(0)
    val direct = ShadePlot.rasterByGroup(sf0001.lineitem, spec(), col("l_linestatus"))
      .filter(col("grp") === "F").agg(sum("c")).head().getLong(0)
    assert(f == direct)
  }

  test("colormaps: endpoints and monotone luminance") {
    for (cm <- Seq("fire", "gray", "viridis")) {
      val f = ShadePlot.colormap(cm) _
      // defined and in-range over the whole domain, including clamping
      for (v <- Seq(-0.5, 0.0, 0.25, 0.5, 0.75, 1.0, 1.5)) {
        val (r, g, b) = f(v)
        assert(r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255)
      }
      // luminance grows with shade (dark = sparse, bright = dense)
      def lum(v: Double) = { val (r, g, b) = f(v); 0.299 * r + 0.587 * g + 0.114 * b }
      val ls = Seq(0.0, 0.25, 0.5, 0.75, 1.0).map(lum)
      assert(ls == ls.sorted, s"$cm luminance must be monotone: $ls")
    }
    assert(ShadePlot.colormap("gray")(1.0) == ((255, 255, 255)))
    assert(ShadePlot.colormap("fire")(0.0) == ((0, 0, 0)))
    intercept[IllegalArgumentException](ShadePlot.colormap("nope")(0.5))
  }

  test("n-category composite: distinct colors, single-category pixels stay pure") {
    import spark.implicits._
    // 6 categories (> the old RGB-channel limit of 3), one category per
    // column stripe so every lit pixel is single-category
    val raster = (0 until 6).flatMap(i =>
      Seq((i, 0, s"cat$i", 10L), (i, 1, s"cat$i", 20L)))
      .toDF("xb", "yb", "cat", "c")
    val s = PlotSpec(col("x"), col("y"), Canvas(8, 8, (0.0, 1.0), (0.0, 1.0)))
    val png = Files.createTempDirectory("catpng").resolve("cat.png").toString
    ShadePlot.writePngCategorical(raster, s, png)
    val img = javax.imageio.ImageIO.read(new java.io.File(png))
    // stripe i at yb=1 has the max count in its category -> shade 1.0 ->
    // the pixel is exactly the category's key color
    val key = ShadePlot.colorKey((0 until 6).map(i => s"cat$i"))
    for (i <- 0 until 6) {
      val (r, g, b) = key(s"cat$i")
      val px = img.getRGB(i, 8 - 1 - 1)
      assert(((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff) == ((r, g, b)),
        s"stripe $i must render its pure key color")
    }
    // all 6 colors distinct, first three are the R/G/B primaries
    assert(key.values.toSet.size == 6)
    assert(Seq("cat0", "cat1", "cat2").map(key) ==
      Seq((255, 0, 0), (0, 255, 0), (0, 0, 255)))
  }

  test("categorical composite: partial caller key falls back to generated colors") {
    import spark.implicits._
    // caller pins cat0 only; cat1 and a NULL category must fall back to the
    // generated palette instead of NoSuchElementException-ing
    val raster = Seq((0, 0, "cat0", 10L), (1, 0, "cat1", 10L))
      .toDF("xb", "yb", "cat", "c")
      .union(Seq((2, 0, 20L)).toDF("xb", "yb", "c")
        .select(col("xb"), col("yb"), lit(null).cast("string").as("cat"), col("c")))
    val s = PlotSpec(col("x"), col("y"), Canvas(4, 4, (0.0, 1.0), (0.0, 1.0)))
    val png = Files.createTempDirectory("partkey").resolve("p.png").toString
    ShadePlot.writePngCategorical(raster, s, png, key = Map("cat0" -> ((10, 20, 30))))
    val img = javax.imageio.ImageIO.read(new java.io.File(png))
    val px = img.getRGB(0, 4 - 1 - 0)
    assert((((px >> 16) & 0xff, (px >> 8) & 0xff, px & 0xff)) == ((10, 20, 30)),
      "the pinned category must use the caller's color")
    // the two fallback pixels rendered some non-black color
    assert((img.getRGB(1, 3) & 0xffffff) != 0 && (img.getRGB(2, 3) & 0xffffff) != 0)
  }

  test("categorical raster (colourBy) splits counts per category") {
    val s = PlotSpec(col("l_quantity"), col("l_extendedprice"),
      Canvas(16, 16, (0.0, 50.0), (900.0, 105000.0)),
      colourBy = Some(col("l_returnflag")))
    val r = ShadePlot.raster(sf0001.lineitem, s)
    assert(r.columns.toSeq == Seq("xb", "yb", "cat", "c"))
    assert(r.agg(sum("c")).head().getLong(0) == sf0001.lineitem.count())
  }
}
