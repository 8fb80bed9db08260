package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg._

/** Gold: daily conversion funnel over segment dimensions. Adapted from
  * reference gold_conversion_funnel_daily.sql:10-91 — the widest
  * grouping key in the suite (5-key A9), per-stage distinct users
  * (A3), stage-to-stage rates (A12), and a post-aggregation filter
  * (P7: `WHERE stage_1_view_users > 0`).
  *
  * Scale: 5-key hash agg = one shuffle; the three distinct-user
  * aggregates share the same grouping so Catalyst plans a single
  * expand + two-phase aggregate rather than three scans.
  */
object ConversionFunnelDaily {

  def build(silver: DataFrame): DataFrame = {
    val t = (x: String) => col("event_type") === x
    silver.groupBy(col("event_date"), col("day_of_week_num"), col("is_weekend"),
        col("time_of_day"), col("price_bucket"))
      .agg(
        countDistinctIf(t("view"), col("user_id")).as("stage_1_view_users"),
        countDistinctIf(t("click"), col("user_id")).as("stage_2_click_users"),
        countDistinctIf(t("purchase"), col("user_id")).as("stage_3_purchase_users"),
        count(lit(1)).as("total_events"),
        moneySumIf(t("purchase"), col("price")).as("funnel_revenue"))
      .filter(col("stage_1_view_users") > 0)
      .withColumn("view_to_click_rate", pct(col("stage_2_click_users"), col("stage_1_view_users")))
      .withColumn("click_to_purchase_rate", pct(col("stage_3_purchase_users"), col("stage_2_click_users")))
      .withColumn("overall_conversion_rate", pct(col("stage_3_purchase_users"), col("stage_1_view_users")))
      .orderBy(col("event_date"), col("time_of_day"), col("price_bucket"))
  }

  val oracleSql: String = SilverEvents.oracleCte +
    """
      |SELECT * FROM (
      |  SELECT
      |    event_date, day_of_week_num, is_weekend, time_of_day, price_bucket,
      |    count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS stage_1_view_users,
      |    count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS stage_2_click_users,
      |    count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS stage_3_purchase_users,
      |    count(*) AS total_events,
      |    CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                        THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                        ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS funnel_revenue,
      |    CAST(round(CAST(100.0 * CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS DOUBLE)
      |          / nullif(CAST(count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS DOUBLE), 0)
      |        AS DECIMAL(28,10)), 2) AS DOUBLE)
      |      AS view_to_click_rate,
      |    CAST(round(CAST(100.0 * CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS DOUBLE)
      |          / nullif(CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS DOUBLE), 0)
      |        AS DECIMAL(28,10)), 2) AS DOUBLE)
      |      AS click_to_purchase_rate,
      |    CAST(round(CAST(100.0 * CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS DOUBLE)
      |          / nullif(CAST(count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS DOUBLE), 0)
      |        AS DECIMAL(28,10)), 2) AS DOUBLE)
      |      AS overall_conversion_rate
      |  FROM silver
      |  GROUP BY event_date, day_of_week_num, is_weekend, time_of_day, price_bucket
      |) WHERE stage_1_view_users > 0
      |ORDER BY event_date, time_of_day, price_bucket""".stripMargin
}
