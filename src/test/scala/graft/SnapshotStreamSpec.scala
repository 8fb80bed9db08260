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

  test("offsets round-trip through json") {
    val s = new graft.sources.SnapshotMicroBatchStream("/nonexistent",
      new org.apache.spark.sql.types.StructType(), new org.apache.spark.sql.types.StructType())
    assert(s.deserializeOffset("""{"version":42}""") == graft.sources.VersionOffset(42L))
    assert(graft.sources.VersionOffset(7L).json() == """{"version":7}""")
  }
}
