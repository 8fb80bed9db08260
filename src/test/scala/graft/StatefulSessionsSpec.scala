package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.marts.TpchQueries
import graft.sources.Tables
import graft.streaming.StatefulSessions

class StatefulSessionsSpec extends AnyFunSuite {
  import TestSession._

  test("streaming stateful sessionization agrees with the batch window formulation") {
    val tmp = Files.createTempDirectory("graft_state_").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$tmp/in")

    val stream = graft.streaming.StreamingEvents.readStream(spark, s"$tmp/in")
    val q = StatefulSessions.sessions(StatefulSessions.toEventIn(stream))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val got = spark.table("sessions_out").cache()
    val batch = TpchQueries.sessionize(spark, sf).cache()

    // The streaming run closes sessions by gap or watermark timeout;
    // sessions still open at end-of-stream (last events within the
    // final watermark horizon) are retained in state, so streaming
    // emits a PREFIX of the batch sessions.
    val gotN = got.count()
    val batchN = batch.count()
    assert(gotN > 0 && gotN <= batchN)
    assert(batchN - gotN <= Tables.events(spark, sf)
      .select(count_distinct(col("user_id"))).first().getLong(0))

    // every emitted session matches a batch session exactly on
    // (user, start, events, revenue)
    val gotKeyed = got.select(col("user_id"),
      col("session_start_sec"), col("session_events").cast("long").as("session_events"),
      round(col("session_revenue"), 2).as("rev"))
    val batchKeyed = batch.select(col("user_id"),
      unix_timestamp(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start_sec"),
      col("session_events"),
      round(col("session_revenue"), 2).as("rev"))
    assert(gotKeyed.except(batchKeyed).count() === 0)
  }
}
