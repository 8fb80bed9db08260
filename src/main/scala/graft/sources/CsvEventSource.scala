package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV event source with an explicit schema + ingest-time metadata
  * enrichment — the reference's bronze ingestion path (SURVEY §2.1 S1,
  * §2.2 P2: spark/jobs/bronze_ingestion.py:156-182 reads CSV with
  * header and appends `_ingestion_time` / `_source_file` /
  * `_processing_date`).
  *
  * The schema is DECLARED, not inferred: inference costs an extra full
  * read and can drift between files; the reference treats its Iceberg
  * DDL as the contract and we do the same (SURVEY §1.3). An optional
  * validation mode runs inference on a sample and asserts
  * compatibility instead.
  *
  * Determinism (SURVEY §7.6 #1): ingestion time is an explicit
  * parameter, not current_timestamp().
  */
object CsvEventSource {

  /** Raw event contract (events-table shape, FIXTURES §4 adapter). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .schema(schema)
      .csv(path)

  /** PERMISSIVE read that quarantines malformed lines instead of
    * failing the job: unparseable rows keep their raw text in
    * `_corrupt_record` (all contract fields NULL), well-formed rows
    * have it NULL — split with a `_corrupt_record IS NULL` filter.
    * The continue-and-quarantine bronze-ingestion mode; `read` (strict
    * declared schema) remains the default contract. */
  def readPermissive(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .csv(path)

  /** Ingest-time metadata columns (bronze_ingestion.py:166-169 analog;
    * `_source_file` from the scan's file metadata, not a literal —
    * correct under multi-file globs). */
  def enrich(df: DataFrame, ingestionTime: java.sql.Timestamp): DataFrame =
    df.withColumn("_ingestion_time", lit(ingestionTime))
      .withColumn("_source_file", input_file_name())
      .withColumn("_processing_date", to_date(lit(ingestionTime)))

  /** True when a column inference produced can safely serve a declared
    * type: exact match, numeric widening toward the declaration, or a
    * string-typed declaration (accepts anything). A declared timestamp
    * also accepts an inferred string — custom timestamp formats read
    * as strings under inference but parse under the declared schema. */
  private[sources] def compatible(inferred: DataType, declared: DataType): Boolean =
    (inferred, declared) match {
      case (i, d) if i == d => true
      case (_, StringType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (LongType, DoubleType) => true
      case (StringType, TimestampType) => true
      case _ => false
    }

  /** Schema-inference-as-validation (the other half of S1, reference
    * bronze_ingestion.py:156-159 `inferSchema=true`): infer from a
    * sample and return one message per declared column the inferred
    * shape cannot serve (missing, or type-incompatible). Empty = the
    * contract holds. */
  def validateInferredSchema(spark: SparkSession, path: String,
                             declared: StructType = schema): Seq[String] = {
    val inferred = spark.read
      .option("header", "true").option("inferSchema", "true")
      .option("samplingRatio", "1.0")
      .csv(path).schema
    declared.fields.toSeq.flatMap { f =>
      inferred.fields.find(_.name == f.name) match {
        case None =>
          Some(s"${f.name}: missing from source")
        case Some(i) if !compatible(i.dataType, f.dataType) =>
          Some(s"${f.name}: inferred ${i.dataType.simpleString} " +
            s"incompatible with declared ${f.dataType.simpleString}")
        case _ => None
      }
    }
  }

  /** Pre-flight verification (SURVEY §2.1 S6: sample-read + required
    * columns + per-column inferred-vs-declared type compatibility +
    * non-empty; dags/01_download_kaggle_dataset.py:113-147 analog).
    * Throws with a precise message on contract violation. */
  def preflight(spark: SparkSession, path: String, requiredCols: Seq[String]): Long = {
    val sample = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path).limit(100)
    val missing = requiredCols.filterNot(sample.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    val incompatible = validateInferredSchema(spark, path,
      StructType(schema.fields.filter(f => requiredCols.contains(f.name))))
    require(incompatible.isEmpty, s"schema contract violations: ${incompatible.mkString("; ")}")
    val n = read(spark, path).count()
    require(n > 0, s"empty source: $path")
    n
  }
}
