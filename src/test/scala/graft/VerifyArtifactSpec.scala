package graft

import java.nio.file.Files

/** The driver-artifact contract (round 8 post-mortem): the driver reads
  * each query's output directory with `pyarrow.dataset.dataset(dir)`,
  * which accepts ONLY parquet files plus basenames its default
  * `ignore_prefixes=['.','_']` skips. Round 8 shipped bare
  * `canon.txt`/`canon.md5` sidecars into those directories and the
  * official gate went 0/109 with ArrowInvalid on every query while local
  * checks stayed green. These tests pin the contract at the JVM side:
  * everything Verify ever emits under a query dir must be `*.parquet` or
  * `_`/`.`-prefixed. (scripts/check.py pins the Python side by reading
  * the directory through pandas/pyarrow exactly like the driver.)
  */
class VerifyArtifactSpec extends SparkSpec {

  test("canon sidecar basenames are underscore-prefixed (pyarrow-ignored)") {
    assert(Verify.CanonTxt.startsWith("_") || Verify.CanonTxt.startsWith("."))
    assert(Verify.CanonMd5.startsWith("_") || Verify.CanonMd5.startsWith("."))
  }

  test("a Verify-shaped query output dir contains only parquet and _/.-prefixed files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("verify_artifact").toFile
    val out = s"${dir.getAbsolutePath}/q_probe"
    Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, null.asInstanceOf[String], 2.0))
      .toDF("id", "s", "x")
      .coalesce(1).write.mode("overwrite").parquet(out)
    Verify.canonDump(spark, out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".parquet")), s"no parquet written: ${files.toSeq}")
    assert(files.contains(Verify.CanonMd5) && files.contains(Verify.CanonTxt),
      s"sidecars missing: ${files.toSeq}")
    val offenders = files.filterNot(f =>
      f.endsWith(".parquet") || f.startsWith("_") || f.startsWith("."))
    assert(offenders.isEmpty,
      s"files the driver's pyarrow.dataset read would choke on: ${offenders.toSeq}")
  }

  test("canon sidecar md5 matches the dumped body") {
    import spark.implicits._
    val dir = Files.createTempDirectory("verify_artifact_md5").toFile
    val out = s"${dir.getAbsolutePath}/q_probe2"
    Seq((1L, 0.1), (2L, 0.2)).toDF("id", "x")
      .coalesce(1).write.mode("overwrite").parquet(out)
    Verify.canonDump(spark, out)
    val body = Files.readString(java.nio.file.Paths.get(s"$out/${Verify.CanonTxt}"))
      .stripSuffix("\n")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val stored = Files.readString(java.nio.file.Paths.get(s"$out/${Verify.CanonMd5}")).trim
    assert(stored == md5)
  }
}
