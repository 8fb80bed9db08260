package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.StreamingEvents

/** Stream-stream interval join parity: the same
  * purchaseSignupIntervalJoin plan over (a) a file stream with
  * watermarks on both sides and (b) the batch frame must produce the
  * same joined pairs — inner interval joins emit only once both sides
  * are present, and the replay contains no late data, so the sets are
  * equal. */
class StreamStreamJoinSpec extends AnyFunSuite {
  import TestSession._

  test("stream-stream interval join equals the batch interval join") {
    val tmp = Files.createTempDirectory("graft_ssj_").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(s"$tmp/in")

    val q = StreamingEvents
      .purchaseSignupIntervalJoin(StreamingEvents.readStream(spark, s"$tmp/in"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val got = spark.table("ssj_out")
      .select("purchase_id", "user_id", "p_ts", "s_ts")
    val batch = StreamingEvents
      .purchaseSignupIntervalJoin(Tables.events(spark, sf))

    assert(got.count() > 0, "fixture should contain purchase/signup pairs within 1h")
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)

    // interval bound respected: signup within (p_ts - 1h, p_ts]
    assert(batch.filter(col("s_ts") > col("p_ts") ||
      col("s_ts") < col("p_ts") - expr("INTERVAL 1 HOUR")).isEmpty)
  }
}
