package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution support on plain Parquet tables — the reference's
  * add-column demo (SURVEY §1.3 / §2.1 K6-K7: schema_add_column.py
  * `ALTER TABLE … ADD COLUMN payment_method STRING` without rewrite;
  * schema_verify.py: old rows read back NULL, new rows carry values).
  *
  * Parquet mapping: writers append files with the extended schema;
  * readers pass `mergeSchema` so the union schema resolves and
  * pre-evolution files surface NULL for the new columns. (On Iceberg
  * tables the same API would issue the ALTER TABLE DDL instead.)
  */
object SchemaEvolution {

  /** Read a table directory with schema merging across file
    * generations. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Append a batch that may carry extra columns. */
  def appendEvolved(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** DESCRIBE analog (K7): column name/type listing. */
  def describe(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)

  /** The schema_verify.py checks as code: count NULL/non-NULL of an
    * evolved column split by generation. */
  def evolutionReport(evolved: DataFrame, newCol: String): DataFrame =
    evolved.agg(
      count(lit(1)).as("total_rows"),
      count(when(col(newCol).isNull, 1)).as("pre_evolution_rows"),
      count(when(col(newCol).isNotNull, 1)).as("post_evolution_rows"))
}
