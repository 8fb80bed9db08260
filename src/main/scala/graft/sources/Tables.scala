package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table registry over the driver's synthetic parquet testdata
  * (TESTDATA.md). Mirrors the reference's layered name-resolved table
  * access (reference: spark/jobs/sync_gold_to_clickhouse.py:77
  * `spark.table(...)`; dbt `{{ source('bronze','ecommerce_events') }}`).
  *
  * Design note (100 TB): these are thin wrappers over
  * `spark.read.parquet` — scans stay DSv2/vectorized, so Catalyst
  * predicate pushdown, column pruning, and partition pruning all apply
  * to whatever the caller composes on top.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses by
    // default; read nanos as long and convert below. Session-level conf,
    // safe to set idempotently here (drivers may hand us any session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` normalized to TimestampType (µs) whatever the
    * file carries. TIMESTAMP(NANOS) files arrive as long via the conf
    * above — floor-division ns→µs matches DuckDB's parquet ns→µs
    * truncation, so oracle comparisons stay exact. TIMESTAMP(MICROS)
    * files (the regenerated driver testdata) arrive as TIMESTAMP_NTZ —
    * cast to TimestampType under the UTC session (same instants),
    * because the whole query surface was built against TimestampType
    * and NTZ forbids the epoch casts (`cast(ts AS bigint)`,
    * `unix_micros`) the sessionize/as-of family relies on. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
