package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.IvfAnn
import graft.sources.Tables
import graft.streaming.StreamingAnnIndex

/** Streaming IVF index maintenance: the streamed inverted-list state
  * must reproduce the batch upsert operator exactly (append ≡ rebuild
  * under a fixed quantizer), across multiple checkpointed deliveries. */
class StreamingAnnSpec extends AnyFunSuite {
  import TestSession._

  test("streaming IVF upsert: streamed index == batch assignment; search parity with the batch op") {
    val tmp = Files.createTempDirectory("graft_sann_").toString
    val emb = Tables.embeddings(spark, sf)
    // the deterministic arrival split the batch operator uses
    val corpus = emb.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val arrivals = emb.filter(pmod(col("vec_id"), lit(10)) === 7)
    // offline phase: quantizer trained on the pre-arrival corpus only,
    // persisted — the fixed state every delivery assigns against
    IvfAnn.centroids(corpus).write.mode("overwrite").parquet(s"$tmp/cents")
    val cents = spark.read.parquet(s"$tmp/cents").localCheckpoint()

    // delivery 1: half the arriving vectors
    arrivals.filter(pmod(col("vec_id"), lit(2)) === 0)
      .write.mode("overwrite").parquet(s"$tmp/in")
    val w1 = StreamingAnnIndex.ivfUpsertWriter(
        StreamingAnnIndex.readEmbeddingsStream(spark, s"$tmp/in"),
        s"$tmp/cents", s"$tmp/lists")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    w1.awaitTermination(120000)
    // delivery 2: the rest — the checkpoint resumes past delivery 1
    arrivals.filter(pmod(col("vec_id"), lit(2)) =!= 0)
      .write.mode("append").parquet(s"$tmp/in")
    val w2 = StreamingAnnIndex.ivfUpsertWriter(
        StreamingAnnIndex.readEmbeddingsStream(spark, s"$tmp/in"),
        s"$tmp/cents", s"$tmp/lists")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    w2.awaitTermination(120000)

    // schema stability (r9 advice, closed r11): an empty or absent
    // lists directory must read with EXACTLY the schema a populated
    // one produces — a `select *` consumer's shape cannot depend on
    // whether the first delivery has landed yet
    val emptyRead = StreamingAnnIndex.readLists(spark, s"$tmp/lists_never_written")
    assert(emptyRead.schema === StreamingAnnIndex.listsSchema)
    assert(emptyRead.count() === 0)

    val streamed = StreamingAnnIndex.readLists(spark, s"$tmp/lists")
    assert(streamed.schema.fieldNames.toSeq ===
      StreamingAnnIndex.listsSchema.fieldNames.toSeq,
      "populated read must agree with the empty-read schema, batch_id included")
    // the streamed lists hold every arrival exactly once, in the same
    // list the batch assignment puts it in
    val direct = IvfAnn.assign(arrivals, cents)
      .select("centroid_id", "vec_id")
    assert(streamed.count() === arrivals.count())
    assert(streamed.select("centroid_id", "vec_id").except(direct).count() === 0)
    assert(direct.except(streamed.select("centroid_id", "vec_id")).count() === 0)

    // search parity: corpus lists + streamed lists probed by the shared
    // search tail == the batch upsert operator's result over the same
    // quantizer (append ≡ rebuild under fixed centroids)
    val updated = IvfAnn.assign(corpus, cents).unionByName(
      streamed.select("centroid_id", "vec_id", "label", "embedding"))
    val got = IvfAnn.searchLists(updated, emb, cents,
      nProbes = 10, k = 5, nprobe = 4)
    val expected = IvfAnn.searchLists(
      IvfAnn.assign(corpus, cents).unionByName(IvfAnn.assign(arrivals, cents)),
      emb, cents, nProbes = 10, k = 5, nprobe = 4)
    assert(got.count() === expected.count())
    assert(got.except(expected).count() === 0)
    assert(expected.except(got).count() === 0)
  }
}
