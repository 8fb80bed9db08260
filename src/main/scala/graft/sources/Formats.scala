package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-format IO surface (SURVEY §2.1 scans/sinks generalized):
  * the reference reads CSV and writes parquet; a complete engine
  * round-trips every columnar/text format the runtime ships —
  * parquet, ORC, CSV, JSON (no Iceberg/Delta/Avro jars in this
  * environment; `Tables` + `ServingSink` carry the
  * partitioned-parquet serving path).
  *
  * Format guidance at scale: parquet/ORC (columnar, splittable,
  * predicate-pushdown) for data; CSV/JSON only at ingest boundaries —
  * they are row-oriented, schema-less, and JSON timestamps lose
  * sub-second precision portability, so convert on first touch.
  */
object Formats {

  def write(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (format match {
      case "csv" => w.option("header", "true")
      case _ => w
    }).save(path)
  }

  def read(spark: SparkSession, path: String, format: String,
           schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val r2 = schema.map(r.schema).getOrElse(r)
    (format match {
      case "csv" => r2.option("header", "true")
      case _ => r2
    }).load(path)
  }

  val roundTrippable: Seq[String] = Seq("parquet", "orc", "json", "csv")
}
