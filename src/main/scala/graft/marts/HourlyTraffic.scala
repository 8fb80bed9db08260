package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg._

/** Gold: hourly traffic patterns. Adapted from reference
  * gold_hourly_traffic.sql:26-49 — 2-key GROUP BY (A9) plus derived
  * key functions (time_of_day, is_weekend), COUNT(*) (A5),
  * COUNT(DISTINCT) (A4), conditional revenue (A1).
  *
  * Scale: one hash-agg shuffle on (event_date, event_hour); the
  * time_of_day / is_weekend columns are functions of the keys so they
  * ride along grouped (no extra shuffle).
  */
object HourlyTraffic {

  def build(silver: DataFrame): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    silver.groupBy(col("event_date"), col("event_hour"), col("time_of_day"), col("is_weekend"))
      .agg(
        count(lit(1)).as("total_events"),
        count_distinct(col("user_id")).as("unique_users"),
        countIf(isPurchase).as("purchase_count"),
        moneySumIf(isPurchase, col("price")).as("hourly_revenue"))
      .withColumn("events_per_user", ratio(col("total_events"), col("unique_users")))
      .orderBy(col("event_date"), col("event_hour"))
  }

  val oracleSql: String = SilverEvents.oracleCte +
    """
      |SELECT
      |  event_date, event_hour, time_of_day, is_weekend,
      |  count(*) AS total_events,
      |  count(DISTINCT user_id) AS unique_users,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS hourly_revenue,
      |  CAST(round(CAST(CAST(count(*) AS DOUBLE)
      |        / nullif(CAST(count(DISTINCT user_id) AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 2) AS DOUBLE) AS events_per_user
      |FROM silver
      |GROUP BY event_date, event_hour, time_of_day, is_weekend
      |ORDER BY event_date, event_hour""".stripMargin
}
