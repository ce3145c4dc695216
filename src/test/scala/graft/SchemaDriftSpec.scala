package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

/** The round-9 regression class: the driver silently changed a parquet
  * file's physical type (`events.ts` TIMESTAMP(NANOS) → timestamp[us]) and
  * the engine computed 1970 garbage for a full round. These specs pin the
  * two defenses: (a) the events reader PROBES the footer instead of
  * assuming one layout, and (b) `Tables.assertSchemasMatch` names any
  * pinned-vs-file divergence loudly. */
class SchemaDriftSpec extends SparkSpec {

  private def scaleDirWith(mutate: (String, String) => Unit): String = {
    val dir = Files.createTempDirectory("drift").toString
    Tables.schemas.keys.foreach { name =>
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$name.parquet"),
        Paths.get(s"$dir/$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    mutate("/root/testdata/sf0.001", dir)
    dir
  }

  test("assertSchemasMatch passes on the pristine testdata dir") {
    Tables.assertSchemasMatch(spark, "/root/testdata/sf0.001")
  }

  test("a type-drifted column fails loudly, naming table, column and both types") {
    val dir = scaleDirWith { (src, out) =>
      // corrupt lineitem: l_quantity double → string
      spark.read.parquet(s"$src/lineitem.parquet")
        .withColumn("l_quantity", col("l_quantity").cast("string"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/tmp_li")
      val part = new java.io.File(s"$out/tmp_li").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$out/lineitem.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val e = intercept[IllegalStateException] {
      Tables.assertSchemasMatch(spark, dir)
    }
    assert(e.getMessage.contains("lineitem.l_quantity"), e.getMessage)
    assert(e.getMessage.contains("DOUBLE") && e.getMessage.contains("STRING"), e.getMessage)
  }

  test("a dropped column is reported as missing") {
    val dir = scaleDirWith { (src, out) =>
      spark.read.parquet(s"$src/region.parquet").drop("r_name")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/tmp_r")
      val part = new java.io.File(s"$out/tmp_r").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(s"$out/region.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val e = intercept[IllegalStateException] {
      Tables.assertSchemasMatch(spark, dir)
    }
    assert(e.getMessage.contains("region.r_name"), e.getMessage)
    assert(e.getMessage.contains("MISSING"), e.getMessage)
  }

  test("events reader adapts to the file's physical ts layout (probe, not pin)") {
    // current files are timestamp[us]; the view must still be a 2024 µs
    // TimestampType — the exact assertion that caught round 9's corruption
    val ev = Tables.eventsView(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val mn = ev.agg(min("ts")).head().getTimestamp(0)
    assert(mn.toString.startsWith("2024-"), s"got $mn")

    // synthesize a NANOS-era file (int64 raw nanos is indistinguishable
    // from the legacy nanosAsLong read path) and check the same view
    // comes back normalized to identical µs instants
    val nanosDir = Files.createTempDirectory("drift-nanos").toString
    val micros = Tables.eventsView(spark, "/root/testdata/sf0.001")
      .withColumn("ts", expr("unix_micros(ts) * 1000")) // µs → raw nanos long
    micros.coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/tmp_ev")
    val part = new java.io.File(s"$nanosDir/tmp_ev").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(s"$nanosDir/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    assert(Tables.eventsTsIsNanos(spark, nanosDir),
      "an int64 ts column must take the nanos read path")
    val evN = Tables.eventsView(spark, nanosDir)
    assert(evN.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val mnN = evN.agg(min("ts")).head().getTimestamp(0)
    assert(mnN == mn, s"nanos-path view must equal micros-path view: $mnN vs $mn")
  }

  test("a TRUE TIMESTAMP(NANOS)-annotated file trips the probe and round-trips to µs") {
    // The raw-int64 test above exercises the nanos READ path; this one
    // guards the PROBE itself against the layout the rounds-1-8 driver
    // actually shipped: an int64 column annotated TIMESTAMP(NANOS,
    // isAdjustedToUTC=false), which Spark cannot write — so the file is
    // written with parquet-mr directly.
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.hadoop.fs.{Path => HPath}

    val rows = Tables.eventsView(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), expr("unix_micros(ts)").as("us"))
      .orderBy("event_id").limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .named("events")
    val dir = Files.createTempDirectory("drift-true-nanos").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new HPath(s"$dir/events.parquet"), conf))
      .withConf(conf).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    rows.foreach { case (id, us) =>
      writer.write(gf.newGroup().append("event_id", id).append("ts", us * 1000L))
    }
    writer.close()

    assert(Tables.eventsTsIsNanos(spark, dir),
      "an annotated TIMESTAMP(NANOS) column must take the nanos read path")
    val got = Tables.eventsView(spark, dir)
      .select(col("event_id"), expr("unix_micros(ts)").as("us"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == rows.toSeq,
      "nanos-annotated file must round-trip to the identical µs instants")
  }
}
