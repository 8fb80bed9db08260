package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.SqlDdl

/** The SQL-text DDL entry path (SURVEY §2.1 K5/K6/K7 as literal DDL):
  * the statements the reference issues as strings
  * (bronze_ingestion.py:94-121 CREATE NAMESPACE + CREATE TABLE …
  * PARTITIONED BY (days(…)) TBLPROPERTIES; schema_add_column.py:24-28
  * ALTER TABLE … ADD COLUMN … COMMENT) must parse and land on the
  * spec-tested PartitionTransforms / mergeSchema behavior. */
class SqlDdlSpec extends AnyFunSuite {
  import TestSession.spark

  // same clause structure, comments and transform as the reference DDL
  private val createEventsDdl = """
    CREATE TABLE IF NOT EXISTS iceberg.bronze.ecommerce_events (
        -- Original columns
        event_time STRING COMMENT 'Event timestamp in UTC',
        event_type STRING COMMENT 'view, cart, purchase',
        product_id BIGINT,
        price DOUBLE,
        amount DECIMAL(18,2),
        _processing_date DATE COMMENT 'Partition key'
    )
    USING iceberg
    PARTITIONED BY (days(_processing_date))
    TBLPROPERTIES (
        'write.format.default' = 'parquet',
        'write.parquet.compression-codec' = 'snappy',
        'format-version' = '2'
    )
  """

  private def newCatalog(): SqlDdl.Catalog = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddl_").toString
    new SqlDdl.Catalog(spark, dir)
  }

  test("CREATE NAMESPACE + CREATE TABLE ddl parses and writes days() layout") {
    val cat = newCatalog()
    cat.sql("CREATE NAMESPACE IF NOT EXISTS iceberg.bronze")
    cat.sql(createEventsDdl)
    // IF NOT EXISTS: second issue is a no-op, not an error
    cat.sql(createEventsDdl)
    val spec = cat.specOf("iceberg.bronze.ecommerce_events")
    assert(spec.columns.map(_.name) === Seq("event_time", "event_type",
      "product_id", "price", "amount", "_processing_date"))
    assert(spec.columns.head.comment === Some("Event timestamp in UTC"))
    assert(spec.transforms.map(t => (t.fn, t.column)) ===
      Seq(("days", "_processing_date")))
    assert(spec.properties("write.parquet.compression-codec") === "snappy")

    import spark.implicits._
    val batch = Seq(
      ("2024-01-01 10:00:00", "view", 1L, 9.5, BigDecimal("9.50"), "2024-01-01"),
      ("2024-01-02 11:00:00", "purchase", 2L, 19.5, BigDecimal("19.50"), "2024-01-02"))
      .toDF("event_time", "event_type", "product_id", "price", "amount", "_processing_date")
      .withColumn("_processing_date", col("_processing_date").cast("date"))
    cat.append("iceberg.bronze.ecommerce_events", batch)
    // hidden-partitioning layout: one _pt_day=<date> dir per day
    val dirs = new java.io.File(cat.tablePath("iceberg.bronze.ecommerce_events"))
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("_pt_day=2024-01-01", "_pt_day=2024-01-02"))
    assert(cat.read("iceberg.bronze.ecommerce_events").count() === 2)
  }

  test("ALTER TABLE ADD COLUMN ddl lands on mergeSchema evolution") {
    val cat = newCatalog()
    cat.sql("""CREATE TABLE t (id BIGINT, name STRING)""")
    import spark.implicits._
    cat.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    cat.sql("""
        ALTER TABLE t
        ADD COLUMN payment_method STRING
        COMMENT 'Payment method: credit_card, debit_card, paypal, cash_on_delivery'
    """)
    // idempotent re-issue (the reference guards with DESCRIBE; here a
    // same-type re-add is a no-op) …
    cat.sql("ALTER TABLE t ADD COLUMN payment_method STRING")
    // … but a type conflict must fail
    intercept[IllegalArgumentException] {
      cat.sql("ALTER TABLE t ADD COLUMN payment_method BIGINT")
    }
    cat.append("t", Seq((3L, "c", "paypal")).toDF("id", "name", "payment_method"))
    val evolved = cat.read("t")
    assert(evolved.filter(col("payment_method").isNull).count() === 2)
    assert(evolved.filter(col("payment_method") === "paypal").count() === 1)
    val desc = cat.sql("DESCRIBE t").result.get.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("payment_method") === "string")
  }

  test("full schema-evolution demo cycle runs end-to-end from SQL text") {
    // the reference's whole demo (bronze_ingestion.py create →
    // schema_add_column.py ALTER → schema_insert_data.py insert rows
    // carrying the new column → schema_verify.py old-rows-NULL check)
    // as literal SQL statements against one catalog
    val cat = newCatalog()
    cat.sql("CREATE NAMESPACE IF NOT EXISTS iceberg.bronze")
    cat.sql(createEventsDdl)
    cat.sql("""
        INSERT INTO iceberg.bronze.ecommerce_events VALUES
          ('2024-01-01 10:00:00', 'view', 1, 9.5, 9.50, '2024-01-01'),
          ('2024-01-02 11:00:00', 'purchase', 2, 19.5, 19.50, '2024-01-02')
    """)
    cat.sql("""
        ALTER TABLE iceberg.bronze.ecommerce_events
        ADD COLUMN payment_method STRING
        COMMENT 'Payment method: credit_card, debit_card, paypal, cash_on_delivery'
    """)
    // post-evolution insert carries the new column; NULL literal and
    // the '' escape must both land ('O''Brien' → O'Brien)
    cat.sql("""
        INSERT INTO iceberg.bronze.ecommerce_events VALUES
          ('2024-12-01 10:00:00', 'purchase', 3, 599.99, 599.99, '2024-12-01', 'credit_card'),
          ('2024-12-01 10:05:00', 'purchase', 4, 129.99, 129.99, '2024-12-01', 'O''Brien pay'),
          ('2024-12-01 10:15:00', 'view', 5, 999.99, 999.99, '2024-12-01', NULL)
    """)
    val t = cat.read("iceberg.bronze.ecommerce_events")
    assert(t.count() === 5)
    // schema_verify.py's check: pre-evolution rows read NULL for the
    // added column; post-evolution non-null values survive the cast path
    assert(t.filter(col("_processing_date") < "2024-02-01")
      .filter(col("payment_method").isNull).count() === 2)
    assert(t.filter(col("payment_method") === "credit_card").count() === 1)
    assert(t.filter(col("payment_method") === "O'Brien pay").count() === 1)
    // declared types survive the all-string staging: DECIMAL + DATE real
    assert(t.schema("amount").dataType.simpleString === "decimal(18,2)")
    assert(t.filter(col("amount") === new java.math.BigDecimal("599.99")).count() === 1)
    // partition layout took the inserted rows (days() transform)
    val dirs = new java.io.File(cat.tablePath("iceberg.bronze.ecommerce_events"))
      .listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.contains("_pt_day=2024-12-01"))
    val desc = cat.sql("DESCRIBE iceberg.bronze.ecommerce_events").result.get
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("payment_method") === "string")
  }

  test("INSERT INTO with explicit column list fills unlisted columns as NULL") {
    val cat = newCatalog()
    cat.sql("CREATE TABLE s (id BIGINT, name STRING, score DOUBLE)")
    cat.sql("INSERT INTO s (id, name) VALUES (1, 'a'), (2, 'b')")
    val read = cat.read("s")
    assert(read.count() === 2)
    assert(read.filter(col("score").isNull).count() === 2)
    // unknown columns and arity mismatches fail loudly
    intercept[IllegalArgumentException] {
      cat.sql("INSERT INTO s (id, nope) VALUES (1, 'x')")
    }
    intercept[IllegalArgumentException] {
      cat.sql("INSERT INTO s (id, name) VALUES (1)")
    }
  }

  test("catalog reattaches to tables from the spec file on disk") {
    val cat = newCatalog()
    cat.sql(createEventsDdl)
    cat.sql("ALTER TABLE iceberg.bronze.ecommerce_events ADD COLUMN payment_method STRING")
    val fresh = new SqlDdl.Catalog(spark, cat.warehouseDir)
    val spec = fresh.specOf("iceberg.bronze.ecommerce_events")
    assert(spec.columns.map(_.name).contains("payment_method"))
    assert(spec.transforms.map(_.name) === Seq("day"))
    assert(spec.columns.find(_.name == "amount").get.sqlType === "DECIMAL(18,2)")
  }

  test("transform grammar: bucket/truncate/identity parse and partition") {
    val cat = newCatalog()
    cat.sql("""CREATE TABLE b (user_id BIGINT, country STRING)
               PARTITIONED BY (bucket(4, user_id), truncate(2, country))""")
    import spark.implicits._
    cat.append("b", Seq((10L, "USA"), (11L, "GBR")).toDF("user_id", "country"))
    val dirs = new java.io.File(cat.tablePath("b"))
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("_pt_bucket_user_id=")))
    val read = cat.read("b")
    assert(read.select("_pt_truncate_country").distinct().as[String]
      .collect().sorted === Array("GB", "US"))
  }
}
