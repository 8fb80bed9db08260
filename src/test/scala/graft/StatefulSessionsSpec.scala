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

  test("transformWithState twin matches the flatMapGroupsWithState sessions") {
    val tmp = Files.createTempDirectory("graft_tws_").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$tmp/in")
    // the v2 operator contracts on the RocksDB state store
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val stream = graft.streaming.StreamingEvents.readStream(spark, s"$tmp/in")
      val q = graft.streaming.TwsSessions.sessions(StatefulSessions.toEventIn(stream))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .format("memory").queryName("tws_sessions_out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val tws = spark.table("tws_sessions_out").cache()
    assert(tws.count() > 0)
    // identical gap-closed sessions as the v1 operator; timeout-closed
    // sessions may differ only at the watermark boundary, so compare
    // the full tuple on the gap-closed set and membership on the rest
    val v1 = spark.table("sessions_out")  // cached by the v1 test above
    def keyed(df: org.apache.spark.sql.DataFrame, by: String) = df
      .filter(col("closed_by") === by)
      .select("user_id", "session_start_sec", "session_end_sec",
        "session_events", "session_revenue")
    assert(keyed(tws, "gap").except(keyed(v1, "gap")).count() === 0)
    assert(keyed(v1, "gap").except(keyed(tws, "gap")).count() === 0)
    // every timeout-closed TWS session exists in the batch formulation
    val batch = TpchQueries.sessionize(spark, sf)
      .select(col("user_id"),
        unix_timestamp(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start_sec"),
        col("session_events").cast("int").as("session_events"))
    assert(tws.select("user_id", "session_start_sec", "session_events")
      .except(batch).count() === 0)
  }
}
