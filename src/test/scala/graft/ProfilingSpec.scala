package graft

import java.nio.file.{Files, Paths}

/** The `--profile` artifact (SURVEY.md §2.1 profile sink; reference
  * `shade_ms/main.py --profile` dask report [U]): per-query execution
  * metrics aggregated by a bounded SparkListener and persisted as JSON. */
class ProfilingSpec extends SparkSpec {

  test("profileQuery captures jobs, tasks, I/O and CPU for a real query") {
    val p = Profiling.profileQuery(spark, "q01_project_math", "/root/testdata/sf0.001")
    assert(p.name == "q01_project_math")
    assert(p.rows > 0, "the profiled collect must surface the row count")
    assert(p.jobs >= 1 && p.stages >= 1 && p.tasks >= 1, s"got $p")
    assert(p.inputBytes > 0, "a parquet-scanning query must report input bytes")
    assert(p.wallSec > 0 && p.cpuSec > 0)
    assert(p.shuffleReadBytes >= 0 && p.spilledBytes >= 0)
  }

  test("a shuffling query reports shuffle volume; dump writes parseable JSON") {
    val p = Profiling.profileQuery(spark, "q05_group_stats", "/root/testdata/sf0.001")
    assert(p.shuffleWriteBytes > 0, s"groupBy must shuffle: $p")
    val out = Files.createTempDirectory("prof").resolve("profile.json").toString
    Profiling.dump(Seq(p), out)
    val body = Files.readString(Paths.get(out))
    assert(body.contains("\"name\":\"q05_group_stats\""))
    assert(body.trim.startsWith("[") && body.trim.endsWith("]"))
    // minimal JSON sanity: one object per profile, comma-separated
    assert(body.linesIterator.count(_.contains("\"wall_sec\"")) == 1)
  }

  test("profiled() isolates metrics to its own window and never leaks the listener") {
    // run something OUTSIDE a profile window first
    sf0001.lineitem.count()
    val (result, p) = Profiling.profiled(spark, "tiny") {
      val n = sf0001.region.collect().length.toLong
      (n * 2, n)
    }
    assert(result == 10L && p.rows == 5L)
    // a second profile of the SAME work reports its own jobs, not a
    // running total (fresh listener + baseline subtraction per call) —
    // the bound is ABSOLUTE (one collect = 1-2 jobs), so accumulation
    // from either the first profile or the pre-window count() trips it
    val (_, p2) = Profiling.profiled(spark, "tiny2") {
      val n = sf0001.region.collect().length.toLong
      (n, n)
    }
    assert(p2.jobs >= 1 && p2.jobs <= 2, s"counters must not accumulate across profiles: $p vs $p2")
  }

  test("the CLI --profile flag persists the artifact next to the plot") {
    val dir = Files.createTempDirectory("cli-prof")
    val prof = dir.resolve("profile.json").toString
    val cells = Cli.run(Seq(
      "--dir", "/root/testdata/sf0.001", "--table", "lineitem",
      "-x", "l_quantity", "-y", "l_extendedprice",
      "--width", "16", "--height", "16",
      "--out", dir.resolve("raster").toString,
      "--profile", prof), spark)
    assert(cells > 0)
    val body = Files.readString(Paths.get(prof))
    assert(body.contains("\"name\":\"cli\"") && body.contains("\"jobs\""))
  }
}
