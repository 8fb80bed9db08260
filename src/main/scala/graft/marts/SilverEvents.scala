package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Bucketize, Dedup}

/** Silver layer: clean / derive / dedup over the raw `events` table.
  *
  * Adapted from the reference's silver model
  * (dbt/models/silver/silver_ecommerce_events.sql:24-123): md5
  * surrogate key over coalesced natural columns (:24-29), lower/trim
  * normalization (:38), timestamp→date/hour/dow derivations (:32-35),
  * price guard + bucketing (:70-74,46-61 analog), weekend flag
  * (:95-98), NULL-user filter (:107), and the W1 window dedup
  * (:111-123) with a deterministic tie-breaker added (SURVEY §7.6 #2).
  *
  * Adapter onto driver testdata (FIXTURES §4): ts→event_time,
  * value→price, props JSON "k"→item_key (product analog).
  *
  * Scale notes: everything before the dedup is a narrow map (no
  * shuffle); the dedup is one hash shuffle on event_unique_id. The
  * NULL-user filter and the column pruning push down to the parquet
  * scan. Raw timestamps are surfaced as formatted-to-second strings so
  * results are precision-portable (parquet ns vs Spark µs).
  */
object SilverEvents {

  /** event-time format shared with the oracle (second precision — ns/µs safe). */
  val TsFmt = "yyyy-MM-dd HH:mm:ss"

  def build(events: DataFrame): DataFrame = {
    val enriched = events
      .filter(col("user_id").isNotNull)
      .withColumn("event_type", lower(trim(col("event_type"))))
      .withColumn("event_time_str", date_format(col("ts"), TsFmt))
      .withColumn("event_unique_id", md5(concat_ws("|",
        col("event_id").cast("string"),
        coalesce(col("user_id").cast("string"), lit("NULL")),
        col("event_type"),
        col("event_time_str"))))
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("event_hour", hour(col("ts")).cast("int"))
      .withColumn("day_of_week_num", dayofweek(col("ts")).cast("int"))
      .withColumn("is_weekend", Bucketize.isWeekend(col("day_of_week_num")))
      .withColumn("time_of_day", Bucketize.timeOfDay(col("event_hour")))
      // nullif guard: digitless props → regexp_extract returns '' and
      // CAST('' AS INT) throws under Spark 4 ANSI mode (and in DuckDB) —
      // both sides must agree on NULL instead.
      .withColumn("item_key",
        nullif(regexp_extract(col("props"), "([0-9]+)", 1), lit("")).cast("int"))
      .withColumn("price", when(col("value") >= 0, round(col("value"), 2)))
      .withColumn("price_bucket", Bucketize.priceBucket(col("price")))

    Dedup.latestPerKey(enriched, Seq("event_unique_id"),
        order = Seq(col("ts").desc, col("event_id").asc))
      .select("event_unique_id", "event_id", "event_time_str", "event_date",
        "event_hour", "day_of_week_num", "is_weekend", "time_of_day",
        "event_type", "user_id", "item_key", "price", "price_bucket")
      .orderBy(col("event_id"))
  }

  /** Inner silver SELECT with an extra raw-side predicate appended to
    * the WHERE — lets the incremental-rebuild oracle build silver over
    * event batches with the exact same transform text. Empty predicate
    * reproduces [[oracleCte]]'s body verbatim. */
  def silverSelectSql(extraWhere: String): String =
    silverSelectPrefix + extraWhere + silverSelectSuffix

  /** DuckDB CTE equivalent (`silver` CTE over raw `events`), used as the
    * shared prefix of every gold-mart oracle. DuckDB shims: dayofweek is
    * 0=Sunday there (SURVEY §7.6 #7) and strftime replaces date_format. */
  val oracleCte: String = "WITH silver AS (" + silverSelectSql("") + "\n)"

  private def silverSelectPrefix: String =
    """
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT
      |      md5(concat_ws('|', CAST(event_id AS VARCHAR),
      |            coalesce(CAST(user_id AS VARCHAR), 'NULL'),
      |            lower(trim(event_type)),
      |            strftime(ts, '%Y-%m-%d %H:%M:%S'))) AS event_unique_id,
      |      event_id,
      |      strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time_str,
      |      CAST(ts AS DATE) AS event_date,
      |      CAST(hour(ts) AS INT) AS event_hour,
      |      CAST(dayofweek(ts) + 1 AS INT) AS day_of_week_num,
      |      dayofweek(ts) IN (0, 6) AS is_weekend,
      |      CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'MORNING'
      |           WHEN hour(ts) BETWEEN 12 AND 17 THEN 'AFTERNOON'
      |           WHEN hour(ts) BETWEEN 18 AND 21 THEN 'EVENING'
      |           ELSE 'NIGHT' END AS time_of_day,
      |      lower(trim(event_type)) AS event_type,
      |      user_id,
      |      CAST(nullif(regexp_extract(props, '([0-9]+)', 1), '') AS INT) AS item_key,
      |      CASE WHEN value >= 0 THEN round(value, 2) END AS price,
      |      CASE WHEN value IS NULL OR value < 0 THEN 'UNKNOWN'
      |           WHEN round(value, 2) < 50 THEN '0-50'
      |           WHEN round(value, 2) < 100 THEN '50-100'
      |           WHEN round(value, 2) < 200 THEN '100-200'
      |           WHEN round(value, 2) < 500 THEN '200-500'
      |           ELSE '500+' END AS price_bucket,
      |      row_number() OVER (
      |        PARTITION BY md5(concat_ws('|', CAST(event_id AS VARCHAR),
      |            coalesce(CAST(user_id AS VARCHAR), 'NULL'),
      |            lower(trim(event_type)),
      |            strftime(ts, '%Y-%m-%d %H:%M:%S')))
      |        ORDER BY ts DESC, event_id ASC) AS rn
      |    FROM events
      |    WHERE user_id IS NOT NULL""".stripMargin

  private def silverSelectSuffix: String = """
      |  ) WHERE rn = 1""".stripMargin

  /** Standalone oracle for the silver table itself. */
  val oracleSql: String =
    oracleCte + "\nSELECT * FROM silver ORDER BY event_id"
}
