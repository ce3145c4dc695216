package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Canvas, ShadePlot}
import graft.operators.ShadePlot.PlotSpec

/** The `shadems`-equivalent command line (reference: `shade_ms/main.py ::
  * main` [U] — `shadems <MS> -x TIME -y DATA:amp --colour-by CORR`):
  * open a data directory, derive two axis expressions, rasterize, shade,
  * write raster parquet and/or a PNG. Axis arguments are full SQL
  * expressions, so the reference's derived axes (`DATA:amp` etc.) are
  * spelled directly — e.g. `-x "sqrt(u*u + v*v)"` — and `--where` is the
  * `--taql` analogue (arbitrary predicate, pushed to the scan by
  * Catalyst).
  *
  * Example:
  * {{{
  * sbt 'runMain graft.Cli --dir /root/testdata/sf0.001 --table lineitem \
  *   -x l_quantity -y l_extendedprice --width 64 --height 64 \
  *   --colour-by l_returnflag --png /tmp/plot.png --out /tmp/raster'
  * }}}
  */
object Cli {

  final case class Args(opts: Map[String, String]) {
    def get(k: String): Option[String] = opts.get(k)
    def req(k: String): String = opts.getOrElse(k,
      throw new IllegalArgumentException(s"missing required option --$k"))
    def int(k: String, dflt: Int): Int = opts.get(k).map(_.toInt).getOrElse(dflt)
    def dbl(k: String): Option[Double] = opts.get(k).map(_.toDouble)
    def flag(k: String): Boolean = opts.contains(k)
  }

  private val known = Set(
    "dir", "table", "x", "y", "where", "width", "height",
    "xmin", "xmax", "ymin", "ymax", "aaxis", "ared", "order",
    "colour-by", "flag-col", "norm", "cmap", "iter", "out", "png",
    "conj", "noconj", "noflags", "sample", "sample-key")

  /** `--key value` pairs plus bare `--key` flags; `-x`/`-y` are aliases.
    * Unknown options are rejected — a misspelled option falling back to a
    * default would silently produce the wrong plot. */
  def parse(argv: Seq[String]): Args = {
    val alias = Map("-x" -> "--x", "-y" -> "--y")
    val flags = Set("--noconj", "--conj", "--noflags")
    val m = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < argv.length) {
      val key = alias.getOrElse(argv(i), argv(i))
      require(key.startsWith("--"), s"unexpected argument: ${argv(i)}")
      require(known.contains(key.drop(2)),
        s"unknown option $key (known: ${known.toSeq.sorted.map("--" + _).mkString(", ")})")
      if (flags.contains(key)) { m(key.drop(2)) = "true"; i += 1 }
      else {
        require(i + 1 < argv.length, s"option $key needs a value")
        m(key.drop(2)) = argv(i + 1); i += 2
      }
    }
    Args(m.toMap)
  }

  private def reduction(a: Args): Seq[Column] =
    (a.get("ared"), a.get("aaxis")) match {
      case (None, _) => Nil
      case (Some(r), ax) =>
        val v = expr(ax.getOrElse(
          throw new IllegalArgumentException("--ared needs --aaxis")))
        // first/last are ORDER-based reductions; defaulting the order to
        // the value itself would silently turn them into min/max
        def ord = expr(a.get("order").getOrElse(throw new IllegalArgumentException(
          s"--ared $r needs --order <expr> (the axis that defines first/last, e.g. a timestamp)")))
        Seq(r match {
          case "count" => count(v).as("ared")
          case "sum"   => sum(v).as("ared")
          case "mean"  => avg(v).as("ared")
          case "std"   => stddev_samp(v).as("ared")
          case "min"   => min(v).as("ared")
          case "max"   => max(v).as("ared")
          case "first" => min_by(v, ord).as("ared")
          case "last"  => max_by(v, ord).as("ared")
          case other => throw new IllegalArgumentException(s"unknown --ared $other")
        })
    }

  /** Testable entry: returns the number of raster cells written. */
  def run(argv: Seq[String], spark: SparkSession): Long = {
    val a = parse(argv)
    val t = Engine.open(spark, a.req("dir"))
    val table = spark.table(a.req("table"))
    val filtered = a.get("where").fold(table)(w => table.filter(expr(w)))
    // --sample: deterministic md5-bucket row subset (plot a reproducible
    // fraction of an arbitrarily large table; same rows on every run and
    // any partitioning — unlike TABLESAMPLE). The key must be a stable
    // row expression; rows sharing a key travel together.
    val df = (a.get("sample"), a.get("sample-key")) match {
      case (Some(f), Some(k)) =>
        graft.operators.Sampling.hashSample(filtered, expr(k), f.toDouble)
      case (Some(_), None) => throw new IllegalArgumentException(
        "--sample needs --sample-key <expr> (a stable row key, e.g. the row id)")
      case _ => filtered
    }
    val x = expr(a.req("x"))
    val y = expr(a.req("y"))
    val w = a.int("width", 256)
    val h = a.int("height", 256)
    // Per-axis limits compose with autocompute (reference: any subset of
    // --xmin/--xmax/--ymin/--ymax may be given; the rest come from the
    // min/max scan) — a partially-specified range must never be dropped.
    val bounds = (a.dbl("xmin"), a.dbl("xmax"), a.dbl("ymin"), a.dbl("ymax"))
    val canvas = bounds match {
      case (Some(x0), Some(x1), Some(y0), Some(y1)) => Canvas(w, h, (x0, x1), (y0, y1))
      case (xmin, xmax, ymin, ymax) =>
        val auto = Canvas.auto(df, x, y, w, h)
        Canvas(w, h,
          (xmin.getOrElse(auto.xRange._1), xmax.getOrElse(auto.xRange._2)),
          (ymin.getOrElse(auto.yRange._1), ymax.getOrElse(auto.yRange._2)))
    }
    val spec = PlotSpec(
      x = x, y = y, canvas = canvas,
      reduction = reduction(a),
      colourBy = a.get("colour-by").map(expr),
      flagMask = a.get("flag-col").filterNot(_ => a.flag("noflags")).map(expr),
      conjugate = a.flag("conj"),
      norm = a.get("norm").getOrElse("eq_hist"))

    val (cells, pngNote) = a.get("iter") match {
      case Some(g) =>
        // one pass builds every group's raster; parquet and PNGs are both
        // per-group outputs of the same grouped plan (reference: the
        // --iter-* loop writes one PNG per field/scan/corr [U])
        val dir = a.req("out") // per-group output requires a directory sink
        val grouped = ShadePlot.rasterByGroup(df, spec, expr(g))
        // the grouped raster feeds two sinks (parquet + PNGs); persist so
        // the input is scanned once — the raster itself is canvas-bounded
        val both = a.get("png").isDefined
        if (both) grouped.persist()
        try {
          grouped.write.partitionBy("grp").mode("overwrite").parquet(dir)
          val pngs = a.get("png").map(t =>
            ShadePlot.writePngPerGroup(grouped, spec, t, a.get("cmap").getOrElse("fire")))
          (spark.read.parquet(dir).count(),
            pngs.map(ps => s"; pngs: ${ps.size} (${ps.headOption.getOrElse("")} …)"))
        } finally if (both) { grouped.unpersist(blocking = false); () }
      case None =>
        val raster = ShadePlot.raster(df, spec)
        val shaded =
          if (spec.colourBy.isEmpty) ShadePlot.shade(raster, spec) else raster
        a.get("out").foreach(dir =>
          shaded.coalesce(1).write.mode("overwrite").parquet(dir))
        a.get("png").foreach { png =>
          if (spec.colourBy.isEmpty)
            ShadePlot.writePng(shaded, spec, png, a.get("cmap").getOrElse("fire"))
          else ShadePlot.writePngCategorical(raster, spec, png)
        }
        (shaded.count(), a.get("png").map(p => s"; png: $p"))
    }
    println(s"[cli] $cells raster cells" +
      pngNote.getOrElse("") +
      a.get("out").map(p => s"; raster: $p").getOrElse(""))
    cells
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    try run(args.toSeq, spark) finally spark.stop()
  }
}
