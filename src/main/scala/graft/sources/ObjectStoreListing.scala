package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object-store listing source (SURVEY §2.1 S5, full form): enumerate
  * a store prefix, pre-flight every object, ingest the good ones,
  * report per file — the reference's discovery step
  * (dags/02_bronze_ingestion_to_iceberg.py:25-49: MinIO
  * `list_objects(prefix, recursive=True)`, `.csv` suffix filter,
  * name-sorted, hard failure when nothing is found) composed with its
  * per-file bronze ingest loop.
  *
  * Uses the Hadoop FileSystem API — the exact client Spark itself
  * reads `s3a://` (and `file://`, in tests) through, so listing
  * semantics match what the scans will see.
  *
  * Scale shape: the loop here is per OBJECT (a metadata operation,
  * like the reference's DAG step), never per row — and the surviving
  * files are handed to ONE multi-path scan rather than a union of
  * per-file DataFrames, so Spark plans a single FileScan over all
  * good objects (splits, locality and column pruning intact). At
  * millions of objects the listing itself distributes by sharding
  * prefixes across [[listFiles]] calls.
  */
object ObjectStoreListing {

  /** One discovered object (name-sorted listing entry). */
  final case class ListedFile(name: String, path: String, sizeBytes: Long)

  /** Per-file ingest outcome: pre-flight row count when ok, the
    * precise contract violation when skipped. */
  final case class FileReport(file: String, ok: Boolean, rows: Long, error: String)

  /** Enumerate objects under `pattern` (a directory, or a glob such
    * as `prefix/star.csv`), recursing into sub-prefixes, keeping
    * `suffix` matches only, name-sorted. */
  def listFiles(spark: SparkSession, pattern: String,
                suffix: String = ".csv"): Seq[ListedFile] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val roots = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = roots.flatMap { st =>
      if (!st.isDirectory) Seq(st)
      else {
        val it = fs.listFiles(st.getPath, true)
        val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) buf += it.next()
        buf.result()
      }
    }
    files
      .filter(st => st.getPath.getName.endsWith(suffix))
      .map(st => ListedFile(st.getPath.getName, st.getPath.toString, st.getLen))
      .sortBy(_.name)
  }

  /** Discover → per-file pre-flight → single multi-path ingest of the
    * surviving files, enriched with ingest metadata. Bad files are
    * skipped (not fatal), mirroring the reference's
    * continue-and-report loop; an EMPTY listing is fatal, mirroring
    * its `No CSV files found` guard. Returns the ingested frame plus
    * one report per discovered file. */
  def ingestListing(spark: SparkSession, pattern: String,
                    requiredCols: Seq[String],
                    ingestionTime: java.sql.Timestamp,
                    suffix: String = ".csv"): (DataFrame, Seq[FileReport]) = {
    val files = listFiles(spark, pattern, suffix)
    require(files.nonEmpty, s"no '$suffix' objects found under: $pattern")
    val reports = files.map { f =>
      try FileReport(f.name, ok = true,
        rows = CsvEventSource.preflight(spark, f.path, requiredCols), error = "")
      catch { case e: Exception =>
        FileReport(f.name, ok = false, rows = 0L,
          error = Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
      }
    }
    val good = files.zip(reports).collect { case (f, r) if r.ok => f.path }
    val df =
      if (good.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CsvEventSource.schema)
      else spark.read
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .schema(CsvEventSource.schema)
        .csv(good: _*)
    (CsvEventSource.enrich(df, ingestionTime), reports)
  }

  /** The reports as a frame (the loggable/servable discovery summary
    * the reference writes to its shared volume). */
  def reportFrame(spark: SparkSession, reports: Seq[FileReport]): DataFrame = {
    import spark.implicits._
    reports.toDF().orderBy("file")
  }
}
