package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.ClickHouseDialect

/** String-level dry-run of the ClickHouse serving dialect against the
  * reference's expectations — no server needed:
  * clickhouse/create_tables.sql:5-26 (daily_sales_summary MergeTree
  * DDL) and spark/jobs/sync_gold_to_clickhouse.py:89-98 (JDBC writer
  * options). */
class ClickHouseDialectSpec extends AnyFunSuite {

  /** The reference's daily_sales_summary schema, as the Spark schema
    * the gold mart sync would carry (create_tables.sql:7-21). */
  private val dailySalesSchema = StructType(Seq(
    StructField("sale_date", DateType, nullable = false),
    StructField("total_revenue", DecimalType(15, 2), nullable = false),
    StructField("total_orders", LongType, nullable = false),
    StructField("avg_order_value", DecimalType(10, 2), nullable = false),
    StructField("conversion_rate", DecimalType(5, 2), nullable = false),
    StructField("_updated_at", TimestampType, nullable = false)))

  test("MergeTree DDL matches the reference's engine/partition/order/settings clauses") {
    val ddl = ClickHouseDialect.createMergeTreeDdl(
      "daily_sales_summary", dailySalesSchema, dateCol = "sale_date")
    // the four structural clauses of create_tables.sql:22-25, verbatim
    assert(ddl.contains("ENGINE = MergeTree()"))
    assert(ddl.contains("PARTITION BY toYYYYMM(sale_date)"))
    assert(ddl.contains("ORDER BY sale_date"))
    assert(ddl.contains("SETTINGS index_granularity = 8192"))
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS daily_sales_summary"))
    // column typing matches the reference vocabulary
    assert(ddl.contains("sale_date Date"))
    assert(ddl.contains("total_revenue Decimal(15, 2)"))
    assert(ddl.contains("total_orders Int64"))
    assert(ddl.contains("avg_order_value Decimal(10, 2)"))
    assert(ddl.contains("_updated_at DateTime"))
  }

  test("nullable columns wrap in Nullable(...) except MergeTree key columns") {
    val schema = StructType(Seq(
      StructField("sale_date", DateType, nullable = true),
      StructField("brand", StringType, nullable = true),
      StructField("total_views", LongType, nullable = true)))
    val ddl = ClickHouseDialect.createMergeTreeDdl("product_performance",
      schema, dateCol = "sale_date")
    // product_performance's nullable columns (create_tables.sql:30-40)
    assert(ddl.contains("brand Nullable(String)"))
    assert(ddl.contains("total_views Nullable(Int64)"))
    // ...but the partition/order key must stay bare even if the Spark
    // field is nullable — MergeTree rejects Nullable keys
    assert(ddl.contains("sale_date Date"))
    assert(!ddl.contains("sale_date Nullable"))
  }

  test("JDBC sync options reproduce the reference writer's option set") {
    val opts = ClickHouseDialect.syncOptions()
    // sync_gold_to_clickhouse.py:94-96, verbatim
    assert(opts("driver") === "com.clickhouse.jdbc.ClickHouseDriver")
    assert(opts("createTableOptions") === "ENGINE = MergeTree() ORDER BY tuple()")
    // explicit ORDER BY variant for keyed marts
    assert(ClickHouseDialect.syncOptions(Seq("sale_date"))("createTableOptions")
      === "ENGINE = MergeTree() ORDER BY sale_date")
  }

  test("serving table name strips the medallion prefix like the reference sync") {
    // sync_gold_to_clickhouse.py:92 `table_name.replace('gold_', '')`
    assert(ClickHouseDialect.servingTableName("gold_daily_sales_summary")
      === "daily_sales_summary")
    assert(ClickHouseDialect.servingTableName("daily_sales_summary")
      === "daily_sales_summary")
  }

  test("unsupported Spark types fail loudly instead of emitting bad DDL") {
    intercept[IllegalArgumentException] {
      ClickHouseDialect.columnType(ArrayType(StringType))
    }
  }
}
