package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{CsvEventSource, SchemaEvolution, Tables}

/** CSV ingestion path (S1/S6/P2), local-rows source (S4), and parquet
  * schema evolution (K6/K7) — SURVEY §2.1. */
class SourcesSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("csv roundtrip with declared schema + metadata enrichment") {
    val tmp = Files.createTempDirectory("graft_csv_").toString
    val ev = Tables.events(spark, sf)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    ev.coalesce(1).write.option("header", "true").mode("overwrite").csv(s"$tmp/in")

    val n = CsvEventSource.preflight(spark, s"$tmp/in",
      Seq("event_id", "ts", "user_id", "event_type", "value"))
    assert(n === ev.count())

    val t0 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val loaded = CsvEventSource.enrich(CsvEventSource.read(spark, s"$tmp/in"), t0).cache()
    assert(loaded.count() === n)
    assert(loaded.schema("ts").dataType.typeName === "timestamp")
    assert(loaded.filter(col("_ingestion_time") =!= lit(t0)).count() === 0)
    assert(loaded.filter(!col("_source_file").contains(".csv")).count() === 0)
    assert(loaded.filter(col("_processing_date") =!= to_date(lit(t0))).count() === 0)
    // values survive the roundtrip
    val orig = Tables.events(spark, sf).select("event_id", "value")
    assert(loaded.select("event_id", "value").except(orig).count() === 0)
  }

  test("object-store listing: discover, preflight, skip bad files, ingest good ones") {
    import graft.sources.ObjectStoreListing
    val tmp = Files.createTempDirectory("graft_list_").toString
    val req = Seq("event_id", "ts", "user_id", "event_type", "value")
    // two valid deliveries under nested prefixes
    val ev = Tables.events(spark, sf).limit(200)
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).cache()
    def dump(df: org.apache.spark.sql.DataFrame, sub: String): Unit = {
      val stage = Files.createTempDirectory("graft_stage_").toString
      df.coalesce(1).write.option("header", "true").mode("overwrite").csv(stage)
      val part = new java.io.File(stage).listFiles().find(_.getName.endsWith(".csv")).get
      val dest = new java.io.File(s"$tmp/$sub")
      dest.getParentFile.mkdirs()
      java.nio.file.Files.copy(part.toPath, dest.toPath)
    }
    val (d1, d2) = (ev.filter(col("event_id") % 2 === 0), ev.filter(col("event_id") % 2 === 1))
    dump(d1, "day=01/events_a.csv")
    dump(d2, "day=02/events_b.csv")
    // a bad delivery: wrong columns entirely
    dump(Seq((1, "x")).toDF("a", "b"), "day=02/broken_c.csv")
    // a non-matching object the suffix filter must ignore
    Files.writeString(java.nio.file.Path.of(s"$tmp/readme.txt"), "not data")

    val listed = ObjectStoreListing.listFiles(spark, tmp)
    assert(listed.map(_.name) === Seq("broken_c.csv", "events_a.csv", "events_b.csv"))

    val t0 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val (df, reports) = ObjectStoreListing.ingestListing(spark, tmp, req, t0)
    assert(reports.size === 3)
    val byName = reports.map(r => r.file -> r).toMap
    assert(!byName("broken_c.csv").ok && byName("broken_c.csv").error.contains("event_id"))
    assert(byName("events_a.csv").ok && byName("events_a.csv").rows === d1.count())
    assert(byName("events_b.csv").ok && byName("events_b.csv").rows === d2.count())
    // good files land in ONE scan, bad file contributes nothing
    assert(df.count() === ev.count())
    assert(df.select("_source_file").distinct().count() === 2)
    assert(ObjectStoreListing.reportFrame(spark, reports).count() === 3)
    // empty listing is fatal (reference: "No CSV files found")
    val e = intercept[IllegalArgumentException] {
      ObjectStoreListing.ingestListing(spark,
        Files.createTempDirectory("graft_empty_").toString, req, t0)
    }
    assert(e.getMessage.contains("no '.csv' objects"))
  }

  test("csv preflight rejects missing required columns") {
    val tmp = Files.createTempDirectory("graft_csv_bad_").toString
    Seq((1, "x")).toDF("a", "b").write.option("header", "true").csv(s"$tmp/in")
    val e = intercept[IllegalArgumentException] {
      CsvEventSource.preflight(spark, s"$tmp/in", Seq("event_id", "ts"))
    }
    assert(e.getMessage.contains("event_id"))
  }

  test("schema inference validates the declared contract per column") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft_csv_val_").toString
    // event_id holds text -> inference sees string, declared bigint
    Seq(("not-a-number", "2024-01-01 00:00:00", 1L))
      .toDF("event_id", "ts", "user_id")
      .write.option("header", "true").csv(s"$tmp/in")
    val declared = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val problems = CsvEventSource.validateInferredSchema(spark, s"$tmp/in", declared)
    assert(problems.exists(_.startsWith("event_id:")), problems.mkString("; "))
    assert(problems.exists(_.startsWith("value: missing")), problems.mkString("; "))
    // ts inferred as string/timestamp is acceptable; user_id widens fine
    assert(!problems.exists(_.startsWith("ts:")), problems.mkString("; "))
    assert(!problems.exists(_.startsWith("user_id:")), problems.mkString("; "))
  }

  test("permissive csv read quarantines malformed rows instead of failing") {
    val tmp = Files.createTempDirectory("graft_csv_perm_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/events.csv"),
      ("event_id,ts,user_id,event_type,value,props\n" +
        "1,2024-01-01 10:00:00,7,view,9.5,{}\n" +
        "not-a-long,garbage-ts,x,view,nan?,{}\n" +
        "2,2024-01-01 11:00:00,8,purchase,20.0,{}\n").getBytes)
    val df = CsvEventSource.readPermissive(spark, s"$tmp/events.csv").cache()
    assert(df.count() === 3)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() === 1)
    assert(bad.head().getAs[String]("_corrupt_record").startsWith("not-a-long"))
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() === 2)
    assert(good.agg(sum(col("value"))).head().getDouble(0) === 29.5)
  }

  test("events.ts is always TimestampType, whatever the file carries") {
    // The driver's testdata has shipped ts as TIMESTAMP(NANOS) (read
    // as long, converted) and as TIMESTAMP(MICROS) (read as
    // TIMESTAMP_NTZ, cast) — the query surface is built against
    // TimestampType epoch casts, so Tables.events must normalize both
    // regimes. Round-7 regression: the micros regen broke
    // q_sessionize/q_asof_nearest_signup with DATATYPE_MISMATCH.
    val ts = graft.sources.Tables.events(spark, sf).schema("ts").dataType
    assert(ts === org.apache.spark.sql.types.TimestampType,
      s"events.ts surfaced as $ts")
  }

  test("local-rows source (S4): literal rows become a typed DataFrame") {
    val df = Seq((1L, "view", 9.5), (2L, "purchase", 20.0))
      .toDF("event_id", "event_type", "value")
    assert(df.count() === 2)
    assert(df.schema("value").dataType.typeName === "double")
  }

  test("schema evolution: old files read NULL for new column, new carry values") {
    val tmp = Files.createTempDirectory("graft_evo_").toString
    val gen1 = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    SchemaEvolution.appendEvolved(gen1, s"$tmp/t")
    val gen2 = Seq((3L, "c", "CARD"), (4L, "d", "CASH"))
      .toDF("id", "payload", "payment_method")
    SchemaEvolution.appendEvolved(gen2, s"$tmp/t")

    val evolved = SchemaEvolution.readEvolved(spark, s"$tmp/t").cache()
    assert(SchemaEvolution.describe(evolved).toMap
      .get("payment_method").contains("string"))
    val rep = SchemaEvolution.evolutionReport(evolved, "payment_method").first()
    assert(rep.getAs[Long]("total_rows") === 4)
    assert(rep.getAs[Long]("pre_evolution_rows") === 2)
    assert(rep.getAs[Long]("post_evolution_rows") === 2)
    // old ids are exactly the NULL ones
    assert(evolved.filter(col("payment_method").isNull)
      .select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("pipeline serving sink writes all marts with positive rows") {
    val out = Files.createTempDirectory("graft_pipeline_").toString
    val summary = Pipeline.runAll(spark, sf, out).collect()
    assert(summary.length === 7)
    assert(summary.forall(_.getAs[Long]("rows_served") > 0))
    // silver also written, partitioned by event_date
    val silverDirs = new java.io.File(s"$out/silver_events").listFiles()
    assert(silverDirs.exists(_.getName.startsWith("event_date=")))
  }
}
