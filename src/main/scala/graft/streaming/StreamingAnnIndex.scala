package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Streaming IVF index maintenance — [[graft.sim.IvfAnn.ivfUpsertTopK]]
  * run as an embedding-delivery file stream: the carried state is the
  * FIXED coarse quantizer (trained offline on the pre-arrival corpus,
  * persisted as a centroid table) plus the inverted-list table; each
  * micro-batch assigns ONLY its own vectors against the broadcast
  * centroids and appends them to the lists. This is the production
  * ANN serving lifecycle: the index absorbs deliveries continuously,
  * quantizer retrain (for drift) is a separate offline job.
  *
  * Scale: per batch, cost is |batch| × nClusters centroid scores + one
  * narrow top-1 window on the batch — the corpus-sized list table is
  * never rescanned and never shuffled. Because assignment is
  * per-vector under a fixed quantizer, streaming-append ≡ batch
  * rebuild (the same algebra [[graft.sim.IvfAnn.ivfUpsertTopK]] pins);
  * batch parity of the SEARCH result over the streamed index is
  * spec-asserted in StreamingAnnSpec.
  *
  * Delivery semantics: foreachBatch is at-least-once, so the list
  * append is a per-batch-partition dynamic OVERWRITE — a replayed
  * batch rewrites its own partition instead of double-inserting its
  * vectors (the same idempotence contract as the streaming dedup
  * index writers). `Trigger.AvailableNow` + checkpointing resume
  * after the last processed delivery.
  */
object StreamingAnnIndex {

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("label", IntegerType)))

  /** Inverted-list rows as persisted: (centroid_id, vec_id, label,
    * embedding) plus the `batch_id` DELIVERY PARTITION column the
    * writer lays the lists out by. batch_id must be IN this schema
    * (r9 advice, closed r11): the populated-directory read discovers
    * it as a partition column and appends it, so an empty-directory
    * read without it returned a 4-column frame while the first
    * delivery silently widened consumers to 5 — a `select *` schema
    * that depended on index state. Declared last, matching where
    * partition discovery places it. */
  val listsSchema: StructType = StructType(Seq(
    StructField("centroid_id", IntegerType),
    StructField("vec_id", LongType),
    StructField("label", IntegerType),
    StructField("embedding", ArrayType(FloatType, containsNull = false)),
    StructField("batch_id", LongType)))

  def readEmbeddingsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embeddingsSchema).parquet(dir)

  /** The accumulated inverted lists (empty before the first
    * delivery). EXPLICIT schema for the same reason as the dedup
    * index reader: an existing-but-empty directory must read as zero
    * rows, not crash-loop schema inference. */
  def readLists(spark: SparkSession, listsDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(listsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(listsSchema).parquet(listsDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], listsSchema)
  }

  /** Index-maintenance writer: assign each arriving batch under the
    * persisted quantizer at `centsDir`, overwrite the batch's own
    * list partition. The quantizer is read once per batch (it is a
    * KB-sized table) and broadcast by [[graft.sim.IvfAnn.assign]]. */
  def ivfUpsertWriter(stream: DataFrame, centsDir: String,
                      listsDir: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cents = spark.read.parquet(centsDir)
        graft.sim.IvfAnn.assign(batch, cents)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(listsDir)
      }
}
