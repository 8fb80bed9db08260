package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{IvfAnn, SemDedup}
import graft.sources.Tables

/** The semantic leg of the incremental-dedup family: delivery-sized
  * batches flagged against the persisted IVF member index — including
  * the index a [[graft.streaming.StreamingAnnIndex]] stream wrote. */
class IncrementalSemDedupSpec extends AnyFunSuite {
  import TestSession._

  private def split(df: org.apache.spark.sql.DataFrame, batch: Boolean) =
    df.filter(if (batch) pmod(col("vec_id"), lit(5)) === 0
              else pmod(col("vec_id"), lit(5)) =!= 0)

  test("matches the direct cluster-restricted reference pair-for-pair") {
    val emb = Tables.embeddings(spark, sf)
    val hist = split(emb, batch = false)
    val batch = split(emb, batch = true)
    val cents = IvfAnn.centroids(hist).localCheckpoint()
    val got = SemDedup.incrementalSemDedupCore(
      cents, IvfAnn.assign(hist, cents).localCheckpoint(),
      batch).localCheckpoint()

    // reference: assign both sides under the same pinned quantizer,
    // join on the cluster, exact portable-rounded cosine >= tau
    val tau = 0.4
    val ha = IvfAnn.assign(hist, cents).localCheckpoint()
    val ba = IvfAnn.assign(batch, cents).localCheckpoint()
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.ops.ConditionalAgg.roundPortable(
        org.apache.spark.sql.graftext.CosineSimilarity.cosineSim(a, b), 6)
    val refCorpus = ba.as("b").join(ha.as("h"),
        col("b.centroid_id") === col("h.centroid_id"))
      .select(col("b.vec_id").as("vec_id"), col("h.vec_id").as("dup_of"),
        lit("corpus").as("src"),
        cos(col("b.embedding"), col("h.embedding")).as("cosine"))
      .filter(col("cosine") >= tau)
    val refBatch = ba.as("x").join(ba.as("y"),
        col("x.centroid_id") === col("y.centroid_id") &&
        col("x.vec_id") > col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("dup_of"),
        lit("batch").as("src"),
        cos(col("x.embedding"), col("y.embedding")).as("cosine"))
      .filter(col("cosine") >= tau)
    val ref = refCorpus.unionByName(refBatch)
    assert(got.count() > 0, "the test corpus has cross-delivery tau-duplicates")
    assert(got.except(ref).count() === 0)
    assert(ref.except(got).count() === 0)
  }

  test("hot-cluster guard: oversized index clusters drop from candidate generation") {
    val emb = Tables.embeddings(spark, sf)
    val hist = split(emb, batch = false)
    val batch = split(emb, batch = true)
    val cents = IvfAnn.centroids(hist).localCheckpoint()
    val index = IvfAnn.assign(hist, cents).localCheckpoint()
    // cap below the LARGEST cluster's size: its members must vanish
    // from corpus-side candidates while other clusters keep flowing
    val sizes = index.groupBy("centroid_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val largest = sizes.maxBy(_._2)
    val cap = largest._2 - 1
    assume(sizes.values.exists(_ <= cap), "needs a second, smaller cluster")
    val gotCapped = SemDedup.incrementalSemDedupCore(cents, index, batch,
      maxCluster = cap).filter(col("src") === "corpus").localCheckpoint()
    val hotMembers = index.filter(col("centroid_id") === largest._1)
      .select(col("vec_id").as("dup_of"))
    assert(gotCapped.join(hotMembers, "dup_of").count() === 0,
      "no corpus claim may cite a member of the over-cap cluster")
    val gotFull = SemDedup.incrementalSemDedupCore(cents, index, batch)
      .filter(col("src") === "corpus")
    assert(gotFull.count() > gotCapped.count(),
      "the cap must actually have removed candidates in this corpus")
    // within-batch claims are unaffected by the index-side guard
    assert(SemDedup.incrementalSemDedupCore(cents, index, batch, maxCluster = cap)
      .filter(col("src") === "batch").count() ===
      SemDedup.incrementalSemDedupCore(cents, index, batch)
        .filter(col("src") === "batch").count())
  }

  test("streaming semantic dedup: checkpointed deliveries == sequential batch application; state stays deduplicated") {
    import graft.streaming.{StreamingAnnIndex, StreamingDedup}
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssd_").toString
    val emb = Tables.embeddings(spark, sf)
    val d1 = split(emb, batch = false)
    val d2 = split(emb, batch = true)
    // quantizer trained offline on the first corpus, persisted (the
    // StreamingAnnIndex lifecycle: retrain is a separate offline job)
    IvfAnn.centroids(d1).write.mode("overwrite").parquet(s"$tmp/cents")
    val pc = spark.read.parquet(s"$tmp/cents").localCheckpoint()

    d1.select("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/in")
    def deliver(ckpt: String = s"$tmp/ckpt"): Unit = {
      val q = StreamingDedup.semanticDedupWriter(
          StreamingAnnIndex.readEmbeddingsStream(spark, s"$tmp/in"),
          s"$tmp/cents", s"$tmp/lists", s"$tmp/out")
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(120000)
      q.stop()
    }
    deliver()
    d2.select("vec_id", "embedding", "label")
      .write.mode("append").parquet(s"$tmp/in")
    deliver()

    // at-least-once REPLAY: restart from a checkpoint whose LAST
    // commit marker is missing (the crash-after-write-before-commit
    // state), so the stream reprocesses delivery 2 against sinks that
    // already contain its own survivors — the batch_id exclusion in
    // the writer must keep every assertion below true (without it,
    // each survivor matches itself at cosine 1.0 and the flags
    // partition is overwritten with self-duplicates). The checkpoint
    // is CLONED first: Spark 4 caches commit-log state per path
    // JVM-globally, so an in-place marker deletion is (correctly)
    // rejected as concurrent checkpoint use.
    val src = java.nio.file.Paths.get(s"$tmp/ckpt")
    val dst = java.nio.file.Paths.get(s"$tmp/ckpt_replay")
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
      ()
    }
    // delete a checkpoint file AND its Hadoop ChecksumFileSystem
    // sidecar — a leftover .name.crc makes the re-created file's
    // rename collide and read as "concurrent checkpoint use"
    def deleteWithCrc(f: java.io.File): Unit = {
      f.delete()
      new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
      ()
    }
    val commits = new java.io.File(s"$tmp/ckpt_replay/commits")
      .listFiles().filter(_.getName.matches("\\d+"))
    assert(commits.nonEmpty)
    commits.sortBy(_.getName.toInt).lastOption.foreach(deleteWithCrc)
    // the clone keeps the original run's query id, and Spark's
    // JVM-global commit-log cache is keyed by it — give the replay a
    // fresh identity (the offset/commit logs drive the replay either
    // way)
    deleteWithCrc(new java.io.File(s"$tmp/ckpt_replay/metadata"))
    deliver(ckpt = s"$tmp/ckpt_replay")

    // sequential reference via the batch operator under the same
    // persisted quantizer (assignment is per-row max with a fixed
    // tie-break, so it cannot differ between the two paths)
    val emptyIdx = StreamingAnnIndex.readLists(spark, s"$tmp/never")
      .select("centroid_id", "vec_id", "embedding")
    val a1 = IvfAnn.assign(d1, pc).localCheckpoint()
    val f1 = SemDedup.incrementalSemDedupFromAssigned(emptyIdx, a1)
      .localCheckpoint()
    val s1 = a1.join(f1.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val a2 = IvfAnn.assign(d2, pc).localCheckpoint()
    val f2 = SemDedup.incrementalSemDedupFromAssigned(
        s1.select("centroid_id", "vec_id", "embedding"), a2)
      .localCheckpoint()
    val expected = f1.unionByName(f2)
    val streamedFlags = spark.read.parquet(s"$tmp/out")
      .select("vec_id", "dup_of", "src", "cosine")
    assert(streamedFlags.count() === expected.count())
    assert(streamedFlags.except(expected).count() === 0)
    assert(expected.except(streamedFlags).count() === 0)

    // survivors-only state: no flagged vector's id is in the lists,
    // and the lists are exactly the sequential survivors
    val lists = StreamingAnnIndex.readLists(spark, s"$tmp/lists")
    assert(lists.join(streamedFlags.select("vec_id").distinct(),
      Seq("vec_id")).count() === 0)
    val expectedState = s1.select("vec_id")
      .unionByName(a2.join(f2.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
        .select("vec_id"))
    assert(lists.select("vec_id").except(expectedState).count() === 0)
    assert(expectedState.except(lists.select("vec_id")).count() === 0)

    // the dedup state doubles as the serving index: the same lists
    // answer an IVF search
    val got = IvfAnn.searchLists(
      lists.select("centroid_id", "vec_id", "label", "embedding"),
      emb, pc, nProbes = 5, k = 3, nprobe = 4)
    assert(got.count() > 0)
  }

  test("stream_semdedup_replay_audit reports an all-green row: forced replay == sequential batch") {
    // the driver-facing audit query (the sf1 spot-oracle entry) must
    // assemble the same machinery this suite exercises and claim true
    // on every gate column
    val row = graft.streaming.ReplayAudit.semReplayAuditQuery(spark, sf).head()
    assert(row.getAs[Int]("deliveries") === 2)
    assert(row.getAs[Boolean]("replay_forced"), "the last commit marker must have existed")
    assert(row.getAs[Boolean]("flags_match_sequential"))
    assert(row.getAs[Boolean]("state_match_sequential"))
    assert(row.getAs[Long]("state_rows") > 0)
  }

  test("the streaming ANN index is valid semantic-dedup state") {
    import graft.streaming.StreamingAnnIndex
    val tmp = java.nio.file.Files.createTempDirectory("graft_isd_").toString
    val emb = Tables.embeddings(spark, sf)
    val hist = split(emb, batch = false)
    val batch = split(emb, batch = true)
    val cents = IvfAnn.centroids(hist).localCheckpoint()
    cents.write.mode("overwrite").parquet(s"$tmp/cents")
    // the corpus arrives as a checkpointed file stream; the membership
    // index accumulates exactly as in StreamingAnnSpec
    hist.write.mode("overwrite").parquet(s"$tmp/in")
    StreamingAnnIndex.ivfUpsertWriter(
        StreamingAnnIndex.readEmbeddingsStream(spark, s"$tmp/in"),
        s"$tmp/cents", s"$tmp/lists")
      .option("checkpointLocation", s"$tmp/ckpt").start()
      .awaitTermination(120000)
    val streamedIndex = StreamingAnnIndex.readLists(spark, s"$tmp/lists")
      .select("centroid_id", "vec_id", "embedding")
    val persistedCents = spark.read.parquet(s"$tmp/cents")
    val viaStream = SemDedup.incrementalSemDedupCore(
      persistedCents, streamedIndex, batch)
    val viaBatch = SemDedup.incrementalSemDedupCore(
      persistedCents, IvfAnn.assign(hist, persistedCents).localCheckpoint(), batch)
    assert(viaStream.count() === viaBatch.count())
    assert(viaStream.except(viaBatch).count() === 0)
    assert(viaBatch.except(viaStream).count() === 0)
  }
}
