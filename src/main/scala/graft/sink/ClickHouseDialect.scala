package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** ClickHouse-dialect DDL + JDBC option generation for the K4 serving
  * sink — the dialect half of the reference's MergeTree sync
  * (clickhouse/create_tables.sql:22-25 `ENGINE = MergeTree()
  * PARTITION BY toYYYYMM(sale_date) ORDER BY sale_date SETTINGS
  * index_granularity = 8192`; spark/jobs/sync_gold_to_clickhouse
  * .py:89-98 `createTableOptions = ENGINE = MergeTree() ORDER BY
  * tuple()`).
  *
  * No ClickHouse server exists in this environment, so the contract
  * is STRING-LEVEL: the emitted DDL/options are spec-pinned against
  * the reference's expectations (ClickHouseDialectSpec), and
  * [[ServingSink.writeJdbc]] passes the options through verbatim —
  * the same separation Spark's own JdbcDialect registry uses (dialect
  * renders SQL strings; the writer executes them).
  */
object ClickHouseDialect {

  val Driver = "com.clickhouse.jdbc.ClickHouseDriver"

  /** Spark type → ClickHouse column type (the subset the gold marts
    * use, mirroring create_tables.sql's vocabulary). Non-nullable
    * Spark fields map bare; nullable fields wrap in `Nullable(...)`
    * EXCEPT partition/order key columns, which MergeTree requires
    * bare (the reference keeps sale_date non-nullable for the same
    * reason). */
  def columnType(dt: DataType): String = dt match {
    case DateType => "Date"
    case TimestampType | TimestampNTZType => "DateTime"
    case LongType => "Int64"
    case IntegerType => "Int32"
    case DoubleType => "Float64"
    case StringType => "String"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case BooleanType => "UInt8"
    case other =>
      throw new IllegalArgumentException(
        s"no ClickHouse mapping for Spark type ${other.simpleString}")
  }

  private def columnDdl(f: StructField, keyCols: Set[String]): String = {
    val base = columnType(f.dataType)
    val t = if (f.nullable && !keyCols(f.name)) s"Nullable($base)" else base
    s"    ${f.name} $t"
  }

  /** Full MergeTree CREATE TABLE for a date-partitioned gold mart —
    * the create_tables.sql shape: monthly partitions on the date key,
    * primary ordering on it, the reference's index granularity. */
  def createMergeTreeDdl(table: String, schema: StructType,
                         dateCol: String, orderBy: Seq[String] = Seq.empty): String = {
    require(schema.fieldNames.contains(dateCol),
      s"date column $dateCol absent from schema")
    val order = if (orderBy.nonEmpty) orderBy else Seq(dateCol)
    val keyCols = (order :+ dateCol).toSet
    val cols = schema.fields.map(columnDdl(_, keyCols)).mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS $table
       |(
       |$cols
       |)
       |ENGINE = MergeTree()
       |PARTITION BY toYYYYMM($dateCol)
       |ORDER BY ${order.mkString(", ")}
       |SETTINGS index_granularity = 8192""".stripMargin
  }

  /** JDBC writer options for the sync path — exactly the option set
    * the reference's sync job passes (driver + createTableOptions;
    * url/user/password are deployment config, supplied by the
    * caller). `ENGINE = MergeTree() ORDER BY tuple()` is the
    * reference's let-the-writer-create-it default
    * (sync_gold_to_clickhouse.py:95-96). */
  def syncOptions(orderBy: Seq[String] = Seq.empty): Map[String, String] = {
    val order = if (orderBy.isEmpty) "tuple()" else orderBy.mkString(", ")
    Map(
      "driver" -> Driver,
      "createTableOptions" -> s"ENGINE = MergeTree() ORDER BY $order",
      // MergeTree ingestion wants large batches (the reference relies
      // on the JDBC default; pin it explicitly for the serving path)
      "batchsize" -> "10000")
  }

  /** The reference strips the medallion prefix when serving
    * (`table_name.replace('gold_', '')`). */
  def servingTableName(goldName: String): String =
    goldName.stripPrefix("gold_")

  /** One-call sync of a gold mart DataFrame (DDL consumers create the
    * table out-of-band with [[createMergeTreeDdl]]; the writer itself
    * uses [[syncOptions]] passthrough). */
  def syncGoldMart(df: DataFrame, url: String, goldName: String,
                   orderBy: Seq[String] = Seq.empty): Unit =
    ServingSink.writeJdbc(df, url, servingTableName(goldName),
      syncOptions(orderBy), mode = "append")
}
