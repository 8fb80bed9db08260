package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) shard interchange — the de-facto
  * release format for LLM training corpora (one JSON object per line,
  * sharded into ~file-sized chunks). This leg proves the engine can
  * EXPORT a curated corpus to JSONL shards and RE-INGEST them
  * losslessly, which is exactly where real pipelines corrupt data:
  * JSON string escaping (newlines, quotes, control chars, non-BMP
  * unicode in `text`), integer/float coercion, and schema drift.
  *
  * Scale rules encoded here (cf. reference bronze ingestion, which
  * reads JSON API pages with a hand-declared schema —
  * /root/reference/spark/jobs/ingest_api_to_bronze.py):
  *  - EXPLICIT schema on read, never inference: schema inference is a
  *    full extra pass over 100 TB before the real read starts, and it
  *    type-flips on dirty rows (int column with one "n/a" → string).
  *  - Parallelism comes from FILE COUNT, not intra-file splits: plain
  *    `.json()` text files split on line boundaries, but compressed
  *    JSONL (gzip) does not — so shard count is the unit of
  *    parallelism and shards are written ≈ uniform by a portable hash
  *    of the doc id (same md5 bucketing as CurationOps.shuffleShards).
  *  - `mode=FAILFAST` on re-ingest: a corrupt line should kill the
  *    job loudly, not silently become a null row (the default
  *    PERMISSIVE mode is how truncated uploads go unnoticed).
  */
object JsonlShards {

  /** The documents corpus schema, declared — the read contract. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Export the corpus as `nShards` JSONL files, shard-assigned by
    * the portable md5 bucket of doc_id (reproducible: same corpus →
    * same shard membership, independent of input partitioning).
    *
    * Placement is an IDENTITY partitioner over the bucket value —
    * `repartition(n, shardCol)` would re-hash the already-computed
    * bucket with Murmur3 and collide ~1/e of the buckets into shared
    * partitions (empty files + 2-3-bucket files), breaking the
    * "shard i holds exactly bucket i" provenance contract. The rows
    * are serialized with `to_json` (the same Jackson generator the
    * DataFrame JSON sink uses, so escaping semantics are identical)
    * and written one text file per bucket. */
  def writeShards(documents: DataFrame, outDir: String, nShards: Int = 8): Unit = {
    val shard = pmod(graft.text.QualityFilters.md5Bucket(col("doc_id")), lit(nShards))
    val keyed = documents
      .select(
        shard.cast("int").as("__shard"),
        to_json(struct(docSchema.fieldNames.map(col): _*)).as("__json"))
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nShards
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    deleteRecursively(documents.sparkSession, outDir) // overwrite semantics
    keyed.rdd
      .map(r => (r.getInt(0), r.getString(1)))
      .partitionBy(part)
      .map(_._2)
      .saveAsTextFile(outDir)
  }

  /** Best-effort recursive delete through the Hadoop FS API (works for
    * any configured filesystem, not just local disk). Best-effort
    * means FS errors only — fatal JVM failures (OOM, interrupts)
    * propagate (r9 advice, closed r11: catch-Throwable here would
    * swallow an OutOfMemoryError into a silent non-delete). */
  private def deleteRecursively(spark: SparkSession, dir: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) { fs.delete(p, true); () }
    } catch { case scala.util.control.NonFatal(_) => }

  /** Re-ingest JSONL shards under the declared schema, FAILFAST. */
  def readShards(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "FAILFAST")
      .json(dir)

  /** Round-trip manifest: documents → JSONL shards → re-ingest →
    * per-source provenance rows (count, char volume, id range, and
    * the order-independent XOR fingerprint over id-salted h60 doc
    * hashes). The oracle computes the SAME manifest from the original
    * parquet — a hash match certifies the JSON encode/decode cycle
    * preserved every row bit-for-bit (any mangled escape, dropped
    * line or coerced field flips a fingerprint). */
  def roundTripManifest(spark: SparkSession, documents: DataFrame): DataFrame = {
    // scratch space under the JVM temp root; the corpus-sized JSONL
    // copy is deleted as soon as the (metadata-sized) manifest is
    // computed — repeated bench/Verify runs must not accumulate
    // corpus-sized directories (on a real cluster this dir would be
    // an object-store scratch prefix with a lifecycle rule)
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
    try {
      writeShards(documents, dir)
      val back = readShards(spark, dir)
      val h = graft.dedup.NearDup.h60(
        concat(col("doc_id").cast("string"), lit("|"), col("text")))
      val manifest = back
        .withColumn("h", h)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("doc_count"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"),
          sum(length(col("text")).cast("long")).as("total_chars"),
          sum(col("n_chars")).as("total_n_chars"),
          expr("bit_xor(h)").as("content_xor"))
        .orderBy(col("source"))
      // materialize the per-source rows (metadata-sized: one row per
      // corpus source) so the scratch dir can be deleted eagerly; the
      // returned frame is rebuilt from the collected rows
      val rows = manifest.collect().toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), manifest.schema)
    } finally deleteRecursively(spark, dir)
  }

  def roundTripManifestQuery(s: SparkSession, dir: String): DataFrame =
    roundTripManifest(s, Tables.documents(s, dir))

  /** DuckDB twin over the ORIGINAL parquet — if Spark's JSONL cycle
    * dropped/mutated anything, the fingerprints cannot match. */
  val roundTripManifestSql: String =
    """SELECT source,
      |  count(*) AS doc_count,
      |  min(doc_id) AS min_doc_id,
      |  max(doc_id) AS max_doc_id,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS total_n_chars,
      |  bit_xor(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 15) AS BIGINT)) AS content_xor
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
