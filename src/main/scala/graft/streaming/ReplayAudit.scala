package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{IvfAnn, SemDedup}
import graft.sources.Tables

/** stream_semdedup_replay_audit — the streaming semantic-dedup
  * writer's replay idempotence exercised AT DATA SCALE, not just in
  * the unit spec (r11 verdict #5: the contract protects against
  * partial partition writes, a failure mode whose surface grows with
  * data volume, so the proof must ride the sf1 spot-oracle, not only
  * a spec-sized corpus).
  *
  * What it does, at whatever SF `dir` holds (the sf1 spot-check runs
  * it over the 10× corpus):
  *   1. splits the embeddings table into a historical corpus and a
  *      second delivery (the [[IncrementalSemDedupSpec]] convention:
  *      vec_id % 5 == 0 is the late delivery);
  *   2. trains the coarse quantizer offline on the historical slice
  *      and persists it (the [[StreamingAnnIndex]] lifecycle);
  *   3. streams delivery 1, then delivery 2, through
  *      [[StreamingDedup.semanticDedupWriter]] with a checkpoint;
  *   4. FORCES an at-least-once replay of the final micro-batch: the
  *      checkpoint is cloned, its last commit marker removed (the
  *      crash-after-write-before-commit state), and the stream
  *      restarted — delivery 2 reprocesses against sinks that already
  *      contain its own survivors;
  *   5. replays the same two deliveries through the BATCH operator
  *      sequentially and compares: flags (set equality both ways) and
  *      surviving-state ids (set equality, plus no flagged id in the
  *      lists).
  *
  * The report is one row of deterministic counts + booleans; the
  * DuckDB oracle reads the dumped row back and keeps it only if every
  * claim is true, so a broken replay contract hash-fails the gate.
  *
  * Scale: everything inside is the writer's own per-batch work
  * (assign once, cluster-join flags, anti-join survivors — bounded by
  * batch × maxCluster) plus set-difference audits that are
  * hash-joins on (vec_id, dup_of) pairs — linear in flags + state,
  * no driver-side loops beyond the four audit counts. */
object ReplayAudit {

  private def split(df: DataFrame, batch: Boolean): DataFrame =
    df.filter(if (batch) pmod(col("vec_id"), lit(5)) === 0
              else pmod(col("vec_id"), lit(5)) =!= 0)

  /** Delete a checkpoint file AND its Hadoop ChecksumFileSystem
    * sidecar — a leftover .name.crc makes the re-created file's
    * rename collide and read as "concurrent checkpoint use". */
  private def deleteWithCrc(f: java.io.File): Unit = {
    f.delete()
    new java.io.File(f.getParentFile, s".${f.getName}.crc").delete()
    ()
  }

  /** Recursive delete of the audit scratch dir — the query writes two
    * full corpus copies plus two checkpoints per invocation and runs
    * in every bench first-pass and sf1 spot-oracle, so leaking it
    * accumulates gigabytes across rounds. */
  private def deleteRecursively(root: java.io.File): Unit = {
    Option(root.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    root.delete()
    ()
  }

  def semReplayAuditQuery(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_replay_audit_").toString
    try semReplayAuditIn(spark, dir, tmp)
    finally deleteRecursively(new java.io.File(tmp))
  }

  /** Body of [[semReplayAuditQuery]]; every frame that outlives `tmp`
    * is localCheckpoint'ed and the returned report is a LocalRelation
    * of already-computed counts, so the caller can delete `tmp` the
    * moment this returns. */
  private def semReplayAuditIn(spark: SparkSession, dir: String, tmp: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val d1 = split(emb, batch = false).select("vec_id", "embedding", "label")
    val d2 = split(emb, batch = true).select("vec_id", "embedding", "label")

    // quantizer trained offline on the pre-arrival corpus, persisted
    IvfAnn.centroids(d1).write.mode("overwrite").parquet(s"$tmp/cents")
    val pc = spark.read.parquet(s"$tmp/cents").localCheckpoint()

    d1.write.mode("overwrite").parquet(s"$tmp/in")
    def deliver(ckpt: String): Unit = {
      val q = StreamingDedup.semanticDedupWriter(
          StreamingAnnIndex.readEmbeddingsStream(spark, s"$tmp/in"),
          s"$tmp/cents", s"$tmp/lists", s"$tmp/out")
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination(300000)
      q.stop()
    }
    deliver(s"$tmp/ckpt")
    d2.write.mode("append").parquet(s"$tmp/in")
    deliver(s"$tmp/ckpt")

    // force the at-least-once replay: clone the checkpoint (Spark 4
    // caches commit-log state per path JVM-globally — in-place marker
    // deletion is rejected as concurrent use), drop the LAST commit
    // marker (crash-after-write-before-commit) and the metadata file
    // (fresh query identity; offsets/commits drive the replay).
    val src = java.nio.file.Paths.get(s"$tmp/ckpt")
    val dst = java.nio.file.Paths.get(s"$tmp/ckpt_replay")
    val walk = java.nio.file.Files.walk(src)
    try walk.forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
      ()
    } finally walk.close()
    val commits = Option(new java.io.File(s"$tmp/ckpt_replay/commits").listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.matches("\\d+"))
    val replayForced = commits.nonEmpty
    commits.sortBy(_.getName.toInt).lastOption.foreach(deleteWithCrc)
    deleteWithCrc(new java.io.File(s"$tmp/ckpt_replay/metadata"))
    deliver(s"$tmp/ckpt_replay")

    // sequential reference via the batch operator under the SAME
    // persisted quantizer (assignment is per-row max with a fixed
    // tie-break, so it cannot differ between the two paths)
    val emptyIdx = StreamingAnnIndex.readLists(spark, s"$tmp/never")
      .select("centroid_id", "vec_id", "embedding")
    val a1 = IvfAnn.assign(d1, pc).localCheckpoint()
    val f1 = SemDedup.incrementalSemDedupFromAssigned(emptyIdx, a1).localCheckpoint()
    val s1 = a1.join(f1.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val a2 = IvfAnn.assign(d2, pc).localCheckpoint()
    val f2 = SemDedup.incrementalSemDedupFromAssigned(
        s1.select("centroid_id", "vec_id", "embedding"), a2)
      .localCheckpoint()
    val expectedFlags = f1.unionByName(f2)
    val expectedState = s1.select("vec_id")
      .unionByName(a2.join(f2.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
        .select("vec_id"))

    val streamedFlags = spark.read.parquet(s"$tmp/out")
      .select("vec_id", "dup_of", "src", "cosine").localCheckpoint()
    val lists = StreamingAnnIndex.readLists(spark, s"$tmp/lists").localCheckpoint()

    val flagsRows = streamedFlags.count()
    val stateRows = lists.count()
    val flagsMatch = flagsRows == expectedFlags.count() &&
      streamedFlags.except(expectedFlags).count() == 0 &&
      expectedFlags.except(streamedFlags).count() == 0
    val flaggedInState = lists.join(
      streamedFlags.select("vec_id").distinct(), Seq("vec_id")).count()
    val stateMatch = flaggedInState == 0 &&
      lists.select("vec_id").except(expectedState).count() == 0 &&
      expectedState.except(lists.select("vec_id")).count() == 0

    import spark.implicits._
    Seq((2, replayForced, flagsRows, stateRows, flagsMatch, stateMatch))
      .toDF("deliveries", "replay_forced", "flags_rows", "state_rows",
        "flags_match_sequential", "state_match_sequential")
  }

  /** Gate oracle: DuckDB reads the dumped report back and keeps the
    * row only if every claim holds — a false boolean (or a missing
    * replay) empties the result and hash-fails the compare. The row
    * counts are deterministic for a given corpus, so they also pin
    * round-over-round drift in the dedup outcome itself. */
  val semReplayAuditSql: String =
    """SELECT * FROM read_parquet('{OUT}/stream_semdedup_replay_audit/*.parquet')
      |WHERE deliveries = 2 AND replay_forced
      |  AND flags_match_sequential AND state_match_sequential
      |  AND flags_rows >= 0 AND state_rows > 0""".stripMargin
}
