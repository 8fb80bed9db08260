package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Serving-layout sinks — the Spark-native stand-in for the
  * reference's ClickHouse MergeTree serving layer (SURVEY §2.1 K2/K4,
  * §4 "serving-side sort/index": clickhouse/create_tables.sql:22-25
  * `ENGINE = MergeTree() PARTITION BY toYYYYMM(sale_date) ORDER BY
  * sale_date`, loaded via JDBC in sync_gold_to_clickhouse.py:89-98).
  *
  * Emulation: partition directories = PARTITION BY, in-file ordering
  * via sortWithinPartitions = ORDER BY key (gives parquet min/max
  * rowgroup pruning on the sort key — the poor man's primary index).
  * Snappy parquet matches the reference's storage codec
  * (bronze_ingestion.py:114-116).
  *
  * Scale: repartition(partitionCols) before partitionBy avoids the
  * many-small-files explosion (each task writing every partition);
  * one file per partition value per task is the contract.
  */
object ServingSink {

  /** Month bucket (`toYYYYMM` analog) for date-partitioned marts. */
  def monthOf(c: Column): Column = date_format(c, "yyyyMM")

  /** NOTE: the sort must LEAD with the partition columns — otherwise
    * FileFormatWriter injects its own (unstable) sort on them to
    * group rows by output file, destroying the data-level ordering. */
  def writeSorted(df: DataFrame, path: String, partitionCols: Seq[String],
                  sortCols: Seq[Column]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(partitionCols.map(col) ++ sortCols: _*)
      .write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Append-mode variant (K1: the reference's Iceberg append sink,
    * bronze_ingestion.py:180-182). */
  def appendSorted(df: DataFrame, path: String, partitionCols: Seq[String],
                   sortCols: Seq[Column]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(partitionCols.map(col) ++ sortCols: _*)
      .write.mode("append")
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Serving write of a date-keyed gold mart: monthly partitions,
    * date-ordered files (the MergeTree layout analog). */
  def writeDateMart(df: DataFrame, path: String, dateCol: String): Unit =
    writeSorted(df.withColumn("part_month", monthOf(col(dateCol))),
      path, Seq("part_month"), Seq(col(dateCol)))

  /** K4: the JDBC serving sink proper (the reference loads gold marts
    * into ClickHouse over JDBC, sync_gold_to_clickhouse.py:89-98
    * analog). Thin passthrough over Spark's jdbc source — each input
    * partition opens one connection and batch-inserts, so parallelism
    * (and the load on the target DB) is `df.rdd.getNumPartitions`;
    * repartition first to tune. Extra options (`batchsize`,
    * `isolationLevel`, `createTableOptions`, `numPartitions`…) pass
    * through verbatim. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                options: Map[String, String] = Map.empty,
                mode: String = "overwrite"): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode(mode)
      .save()

  /** Matching read side (round-trip verification / serving reads). */
  def readJdbc(spark: org.apache.spark.sql.SparkSession, url: String,
               table: String, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Interleaved-bit (Z-order) sort key over two numeric columns:
    * each column min/max-normalized to `bits` bits, then bit-
    * interleaved — pure `functions._` Column arithmetic, fully
    * codegen'd. */
  private[graft] def zKey(a: Column, b: Column,
                         aMin: Double, aMax: Double,
                         bMin: Double, bMax: Double, bits: Int): Column = {
    val scale = (1L << bits) - 1
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else floor((c.cast("double") - lo) / (hi - lo) * scale).cast("long")
    val (na, nb) = (norm(a, aMin, aMax), norm(b, bMin, bMax))
    (0 until bits).map { i =>
      shiftleft(shiftright(na, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(nb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order clustered layout: rows sorted along the interleaved-bit
    * curve of TWO columns, so parquet min/max footer ranges stay tight
    * on BOTH — point/range predicates on either column prune files,
    * where a linear sort prunes only its leading column. One stats
    * pass (driver-side min/max, the usual offline-layout-job shape)
    * + one range shuffle on the z key; the key never reaches the
    * files. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int = 16, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val z = zKey(col(colA), col(colB),
      stats.getDouble(0), stats.getDouble(1),
      stats.getDouble(2), stats.getDouble(3), bits)
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").option("compression", "snappy")
      .parquet(path)
  }
}
