package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Streaming incremental exact dedup — `NearDup.incrementalDedup` run
  * as a corpus-delivery file stream: each micro-batch hashes its docs,
  * dedupes within the batch (min doc_id per fingerprint, copies
  * counted), anti-joins the fingerprint INDEX accumulated by all
  * previous batches, then appends the survivors to the output AND
  * their fingerprints to the index. `Trigger.AvailableNow` +
  * checkpointing make reruns resume after the last processed delivery
  * — the reference's incremental-DAG semantics with the dedup index as
  * the carried state.
  *
  * Scale: the index is a parquet table of 32-char fingerprints — the
  * only state, O(|unique docs|), bloom-prefilterable; each batch does
  * two hash aggs + one anti join, identical to the batch operator
  * (batch-parity is spec-asserted, the same guarantee the silver
  * incremental path carries). The survivors frame is localCheckpoint'd
  * BEFORE the index append so the out/index writes see one consistent
  * result. */
object StreamingDedup {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocumentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsSchema).parquet(dir)

  /** The shared batch-op fingerprint ([[graft.dedup.NearDup.fingerprintCol]])
    * — ONE definition, so streaming/batch parity can't drift. */
  private def fingerprinted(df: DataFrame): DataFrame =
    df.withColumn("fingerprint", graft.dedup.NearDup.fingerprintCol(col("text")))

  private val indexSchema =
    StructType(Seq(StructField("fingerprint", StringType)))

  /** State-so-far reader shared by every writer: EXPLICIT schema
    * (inference would throw on an index directory that exists but
    * holds no parquet yet — crash between mkdir and file commit —
    * turning every later batch into a crash loop; with the schema
    * declared an empty directory just reads as zero rows), Hadoop
    * FileSystem probe so hdfs://s3a:// locations work, and CRITICALLY
    * restricted to `batch_id < thisBatch`: foreachBatch is
    * at-least-once, so a replayed batch re-reads state that already
    * contains ITS OWN previous (possibly partial) writes — without the
    * exclusion the batch's survivors match themselves in the index
    * (self-duplicate flags at identity similarity / empty survivor
    * sets) and the "replay rewrites, never duplicates" contract
    * breaks. batch_id is the partition column, so the filter is
    * partition PRUNING, not a data scan. */
  private def readState(spark: SparkSession, dir: String,
                        schema: StructType, thisBatch: Long): DataFrame = {
    val withBatch = StructType(schema.fields :+ StructField("batch_id", LongType))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all =
      if (fs.exists(p)) spark.read.schema(withBatch).parquet(dir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], withBatch)
    all.filter(col("batch_id") < thisBatch)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Per-batch-partition dynamic overwrite — the idempotent-sink shape
    * every writer shares (a replayed batch rewrites its own
    * `batch_id=` partition instead of duplicating rows). */
  private def overwriteOwnPartition(df: DataFrame, dir: String,
                                    batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  /** Streaming NEAR-dup dedup — [[graft.dedup.NearDup
    * .incrementalMinhashDedup]] as a corpus-delivery stream: the
    * carried state is the banded MinHash signature index PLUS the
    * shingle-set index of every surviving doc (what a production
    * pipeline persists between deliveries; ~|survivors|×bands narrow
    * rows + one set array per survivor). Each micro-batch shingles
    * only ITS OWN docs, flags near-dups of the accumulated corpus and
    * of earlier docs in the same batch via the shared
    * `incrementalMinhashCore`, then appends the SURVIVORS' sets/bands
    * to the state — flagged dups never enter the index, so the corpus
    * state stays deduplicated (the same survivors-only contract as
    * the exact-fingerprint writer below). Batch-parity with the batch
    * operator is spec-asserted (PlatformSpec). */
  def minhashDedupWriter(stream: DataFrame, setsDir: String,
                         bandsDir: String, outDir: String): DataStreamWriter[Row] = {
    val setsSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sh_set", ArrayType(StringType, containsNull = false))))
    val bandsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("band_id", IntegerType),
      StructField("band_hash", StringType)))
    stream.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import graft.dedup.NearDup
        val batchSets = NearDup.shingleSets(batch).localCheckpoint()
        val batchBands = NearDup.bandedSignatures(batchSets)
        val flags = NearDup.incrementalMinhashCore(
            readState(spark, setsDir, setsSchema, batchId),
            readState(spark, bandsDir, bandsSchema, batchId),
            batchSets, batchBands)
          .localCheckpoint()
        val survivors = batchSets
          .join(flags.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        overwriteOwnPartition(flags, outDir, batchId)
        overwriteOwnPartition(survivors, setsDir, batchId)
        overwriteOwnPartition(
          batchBands.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi"),
          bandsDir, batchId)
      }
  }

  /** Both writes are per-batch-partition dynamic OVERWRITES, not blind
    * appends: foreachBatch is at-least-once, so a batch replayed after
    * a partial failure rewrites its own `batch_id=` partition instead
    * of duplicating rows — the idempotent-sink contract Structured
    * Streaming asks of foreachBatch. */
  def incrementalDedupWriter(stream: DataFrame, indexDir: String,
                             outDir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchUnique = fingerprinted(batch)
          .groupBy(col("fingerprint"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("batch_copies"))
        val survivors = batchUnique
          .join(readState(spark, indexDir, indexSchema, batchId),
            Seq("fingerprint"), "left_anti")
          .select(col("doc_id"), col("fingerprint"), col("batch_copies"))
          .localCheckpoint()
        overwriteOwnPartition(survivors, outDir, batchId)
        overwriteOwnPartition(survivors.select(col("fingerprint")),
          indexDir, batchId)
      }

  /** Streaming SEMANTIC dedup — [[graft.sim.SemDedup
    * .incrementalSemDedupCore]] as an embedding-delivery stream,
    * completing the streaming column of the dedup lifecycle matrix
    * (exact fingerprints above, lexical MinHash above, semantic
    * here). Carried state = the FIXED coarse quantizer at `centsDir`
    * (trained offline — the [[StreamingAnnIndex]] contract) plus the
    * IVF member lists of every SURVIVING vector at `listsDir`, laid
    * out exactly as [[StreamingAnnIndex.ivfUpsertWriter]] lays its
    * lists out — the dedup state and the ANN serving index are the
    * SAME table. Each micro-batch assigns only its own vectors ONCE
    * (the pinned assignment is reused for both the flags and the
    * survivors' stored list rows — re-assigning could flip a
    * borderline vector's cluster between the two), flags τ-dups of
    * the accumulated corpus and of earlier same-batch vectors, then
    * appends survivors only — flagged dups never enter the index.
    * Both writes are per-batch-partition dynamic overwrites (replay
    * rewrites, never duplicates). */
  def semanticDedupWriter(stream: DataFrame, centsDir: String,
                          listsDir: String, outDir: String,
                          tau: Double = 0.4,
                          maxCluster: Long = 2000): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cents = spark.read.parquet(centsDir)
        // batch_id < batchId: on an at-least-once replay the lists
        // already hold this batch's own survivors — without the
        // exclusion every one of them would match itself at cosine
        // 1.0 and be flagged as its own duplicate (see readState)
        val index = StreamingAnnIndex.readLists(spark, listsDir)
          .filter(col("batch_id") < batchId)
          .select("centroid_id", "vec_id", "embedding")
        val batchAssigned = graft.sim.IvfAnn.assign(batch, cents)
          .localCheckpoint()
        val flags = graft.sim.SemDedup.incrementalSemDedupFromAssigned(
            index, batchAssigned, tau, maxCluster)
          .localCheckpoint()
        val survivors = batchAssigned
          .join(flags.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
          .localCheckpoint()
        overwriteOwnPartition(flags, outDir, batchId)
        overwriteOwnPartition(survivors, listsDir, batchId)
      }
}
