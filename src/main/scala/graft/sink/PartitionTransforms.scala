package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style partition transforms over plain parquet (SURVEY §2.1
  * K5 — reference spark/jobs/bronze_ingestion.py:113 `PARTITIONED BY
  * (days(_processing_date))`, clickhouse/create_tables.sql:23
  * `PARTITION BY toYYYYMM(sale_date)`).
  *
  * No Iceberg jars exist offline, so "hidden partitioning" is emulated
  * the way a table format does it under the hood: the transform value
  * is materialized as a real column (prefixed `_pt_`) that becomes the
  * partition directory, and the read path derives the matching
  * partition predicate from a filter on the SOURCE column — the
  * rewrite Iceberg performs automatically. PartitionTransformSpec
  * asserts the result: `PartitionFilters` on a date-ranged read
  * (static pruning) and a `DynamicPruningExpression` when the
  * partition column is a join key against a filtered dimension (DPP).
  *
  * Scale shape: transforms keep partition counts bounded (days ≈
  * corpus age in days, bucket(n) exactly n) — the two failure modes a
  * naive `partitionBy(rawCol)` hits at 100 TB are per-value directory
  * explosion and tiny files; `writePartitioned` also repartitions by
  * the transform columns first so each partition value is written by
  * one task (no task×partition small-file cross product).
  */
object PartitionTransforms {

  /** Materialized transform columns are namespaced to keep them out of
    * the logical schema's way. */
  val Prefix = "_pt_"

  /** `days(ts)` — one partition per calendar day (Iceberg days/date). */
  def days(c: Column): Column = to_date(c)

  /** `months(ts)` — ClickHouse `toYYYYMM` / Iceberg month transform. */
  def months(c: Column): Column = date_format(c, "yyyyMM")

  /** `years(ts)` — Iceberg year transform. */
  def years(c: Column): Column = year(c).cast("int")

  /** `hours(ts)` — Iceberg hour transform. */
  def hours(c: Column): Column = date_format(c, "yyyy-MM-dd-HH")

  /** `bucket(n, key)` — stable hash bucket (Iceberg bucket transform;
    * xxhash64 here vs Iceberg's murmur3 — same role, engine-native). */
  def bucket(n: Int, c: Column): Column = pmod(xxhash64(c), lit(n.toLong)).cast("int")

  /** `truncate(width, s)` — Iceberg string truncate transform. */
  def truncate(width: Int, c: Column): Column = substring(c, 1, width)

  /** `truncate(width, n)` — Iceberg numeric truncate (floor to width). */
  def truncateNum(width: Long, c: Column): Column = c - pmod(c, lit(width))

  /** Write `df` partitioned by the given named transforms, each
    * materialized as `_pt_<name>`; rows sorted by `sortCols` inside
    * files. One task per partition value (repartition on the
    * transform columns precedes partitionBy). */
  def writePartitioned(df: DataFrame, path: String,
                       transforms: Seq[(String, Column)],
                       sortCols: Seq[Column] = Nil,
                       mode: String = "overwrite"): Unit = {
    val withCols = transforms.foldLeft(df) { case (d, (n, e)) =>
      d.withColumn(Prefix + n, e)
    }
    val pcols = transforms.map(Prefix + _._1)
    withCols.repartition(pcols.map(col): _*)
      .sortWithinPartitions(pcols.map(col) ++ sortCols: _*)
      .write.mode(mode)
      .option("compression", "snappy")
      .partitionBy(pcols: _*)
      .parquet(path)
  }

  /** Hidden-partitioning read for a `days(dateCol)` layout: the caller
    * filters on the source date column only; the matching partition
    * predicate on `_pt_day` is derived here so the scan prunes
    * directories before listing files. */
  def readDayRange(spark: SparkSession, path: String, dateCol: String,
                   from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col(Prefix + "day").between(lit(from).cast("date"), lit(to).cast("date")))
      .filter(col(dateCol).between(lit(from).cast("date"), lit(to).cast("date")))

  /** Same for a `months(dateCol)` layout (`toYYYYMM` serving marts). */
  def readMonthRange(spark: SparkSession, path: String, dateCol: String,
                     from: String, to: String): DataFrame = {
    def ym(d: String) = date_format(lit(d).cast("date"), "yyyyMM")
    spark.read.parquet(path)
      .filter(col(Prefix + "month").between(ym(from), ym(to)))
      .filter(col(dateCol).between(lit(from).cast("date"), lit(to).cast("date")))
  }
}
