package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, Snapshots}

/** `spark.readStream.table` over the catalog's versioned store: the
  * Delta/Iceberg table-as-stream contract — initial batch = current
  * state, subsequent batches = fast-append deltas only (version
  * numbers as offsets, checkpoint-resumable), non-append rewrites
  * fail the stream loudly. */
class SnapshotStreamSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val wh = Files.createTempDirectory("graft_stream_spec_").toString
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gst", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gst.warehouse", wh)
    "gst"
  }

  /** Drain the table stream through one AvailableNow run into a
    * driver-side buffer (foreachBatch — unlike the memory sink it
    * supports checkpoint recovery), returning the ids delivered by
    * THIS run. */
  private def runAvailableNow(table: String, ckpt: String): Seq[Long] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.table(table)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    got.iterator().asScala.toSeq.sorted
  }

  test("initial batch = current state; restarts consume only appended deltas") {
    spark.sql(s"CREATE NAMESPACE $cat.s")
    spark.range(0, 5).selectExpr("id").createOrReplaceTempView("__st_src")
    spark.sql(s"CREATE TABLE $cat.s.t AS SELECT * FROM __st_src")
    spark.sql(s"INSERT INTO $cat.s.t VALUES (100)") // append v2 pre-stream
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_").toString

    val first = runAvailableNow(s"$cat.s.t", ckpt)
    assert(first == Seq(0L, 1L, 2L, 3L, 4L, 100L),
      "initial batch must load the full current state incl. the append chain")

    // two more appends while the stream is down; restart from checkpoint
    spark.sql(s"INSERT INTO $cat.s.t VALUES (200)")
    spark.sql(s"INSERT INTO $cat.s.t VALUES (201)")
    val delta = runAvailableNow(s"$cat.s.t", ckpt)
    assert(delta == Seq(200L, 201L),
      s"restart must read ONLY the two appended deltas, got ${delta.mkString(",")}")
  }

  test("streaming a created-but-never-written table: empty now, picks up the first snapshot") {
    // capabilities() advertises MICRO_BATCH_READ unconditionally, so a
    // readStream.table over a snapshot-less table must stream an empty
    // source (not throw Scan's default UnsupportedOperationException)
    // and deliver the first snapshot on the next run
    spark.sql(s"CREATE NAMESPACE $cat.fresh")
    spark.sql(s"CREATE TABLE $cat.fresh.t (id BIGINT)")
    val ckpt = Files.createTempDirectory("graft_fresh_ckpt_").toString
    val empty = runAvailableNow(s"$cat.fresh.t", ckpt)
    assert(empty.isEmpty, s"a snapshot-less table must stream zero rows, got $empty")
    spark.sql(s"INSERT INTO $cat.fresh.t VALUES (7), (8)")
    val first = runAvailableNow(s"$cat.fresh.t", ckpt)
    assert(first == Seq(7L, 8L),
      s"the restarted stream must deliver the first snapshot, got $first")
  }

  test("column pruning survives the streamable wrapper on batch reads") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.p")
    spark.range(0, 10).selectExpr("id", "id*2 AS v", "CAST(id AS STRING) AS unused")
      .createOrReplaceTempView("__st_p_src")
    spark.sql(s"CREATE TABLE $cat.p.t AS SELECT * FROM __st_p_src")
    val plan = spark.sql(s"SELECT id FROM $cat.p.t WHERE v = 4")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), EqualTo(v,4)]"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,v:bigint>"), plan)
  }

  test("a non-append snapshot in the unprocessed range fails the stream loudly") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.x")
    spark.range(0, 3).selectExpr("id").createOrReplaceTempView("__st_x_src")
    spark.sql(s"CREATE TABLE $cat.x.t AS SELECT * FROM __st_x_src")
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_x_").toString
    assert(runAvailableNow(s"$cat.x.t", ckpt).size == 3)
    // an overwrite lands in the unprocessed range → next run must fail
    spark.sql(s"INSERT OVERWRITE $cat.x.t SELECT * FROM __st_x_src WHERE id = 0")
    val err = intercept[Exception] { runAvailableNow(s"$cat.x.t", ckpt) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("cannot replay as a delta")),
      s"wanted the non-append failure, got: ${messages(err).mkString(" | ")}")
  }

  test("idempotentAppendWriter: crash-shaped checkpoint replay cannot double-append") {
    val tmp = Files.createTempDirectory("graft_appsink_").toString
    val table = s"$tmp/t"
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val w = Snapshots.idempotentAppendWriter(table, "spec_stream")
    def deliver(ckpt: String): Unit = {
      val q = spark.readStream.schema("id LONG").parquet(s"$tmp/in")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, b: Long) =>
          calls.incrementAndGet(); w(df, b)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "drain must finish")
      ()
    }
    spark.range(0, 50).toDF("id").write.parquet(s"$tmp/in")
    deliver(s"$tmp/ckpt") // batch 0 → v1 (initial full state, tagged)
    spark.range(100, 130).toDF("id").write.mode("append").parquet(s"$tmp/in")
    deliver(s"$tmp/ckpt") // batch 1 → v2 (fast append, tagged)
    assert(Snapshots.readLatest(spark, table).count() == 80)
    assert(Snapshots.versions(table) == Seq(1L, 2L))

    // at-least-once replay: clone the checkpoint (Spark 4 caches
    // commit-log state per path), drop the LAST commit marker
    // (crash-after-write-before-commit) and the metadata file, then
    // restart — Spark re-runs batch 1 with the SAME batch id and the
    // manifest ledger must skip it
    val src = java.nio.file.Paths.get(s"$tmp/ckpt")
    val dst = java.nio.file.Paths.get(s"$tmp/ckpt_replay")
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
      ()
    } finally walk.close()
    def dropWithCrc(f: java.io.File): Unit = {
      f.delete(); new java.io.File(f.getParentFile, s".${f.getName}.crc").delete(); ()
    }
    val commits = Option(new java.io.File(s"$tmp/ckpt_replay/commits").listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.matches("\\d+"))
    assert(commits.nonEmpty, "the crash shape needs a commit marker to drop")
    commits.sortBy(_.getName.toInt).lastOption.foreach(dropWithCrc)
    dropWithCrc(new java.io.File(s"$tmp/ckpt_replay/metadata"))
    val callsBefore = calls.get()
    deliver(s"$tmp/ckpt_replay")
    assert(calls.get() > callsBefore, "the replay must actually re-invoke the writer")
    assert(Snapshots.readLatest(spark, table).count() == 80,
      "the redelivered batch must not double-append")
    assert(Snapshots.versions(table) == Seq(1L, 2L),
      "no new snapshot may commit for a replayed batch id")
  }

  test("offsets round-trip through json") {
    val s = new graft.sources.SnapshotMicroBatchStream("/nonexistent",
      new org.apache.spark.sql.types.StructType(), new org.apache.spark.sql.types.StructType())
    assert(s.deserializeOffset("""{"version":42}""") == graft.sources.VersionOffset(42L))
    assert(graft.sources.VersionOffset(7L).json() == """{"version":7}""")
  }
}
