package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg._

/** Gold: per-user journey / funnel state. Adapted from reference
  * gold_user_journey_funnel.sql:8-69 — per-user 0/1 stage flags via
  * MAX(CASE WHEN) (A6), first-event dates via MIN(CASE WHEN),
  * stage-derivation CASE chain, and view→purchase day gap (§2.8
  * DATEDIFF).
  *
  * Funnel adapted to this dataset's event domain:
  * signup → view → click → purchase (FIXTURES §4 adapter).
  */
object UserJourneyFunnel {

  def build(silver: DataFrame): DataFrame = {
    val t = (x: String) => col("event_type") === x
    silver.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_events"),
        max(when(t("signup"), 1).otherwise(0)).as("has_signup"),
        max(when(t("view"), 1).otherwise(0)).as("has_viewed"),
        max(when(t("click"), 1).otherwise(0)).as("has_clicked"),
        max(when(t("purchase"), 1).otherwise(0)).as("has_purchased"),
        min(when(t("view"), col("event_date"))).as("first_view_date"),
        min(when(t("purchase"), col("event_date"))).as("first_purchase_date"),
        countIf(t("purchase")).as("total_purchases"),
        moneySumIf(t("purchase"), col("price")).as("total_spend"))
      .withColumn("days_view_to_purchase",
        datediff(col("first_purchase_date"), col("first_view_date")))
      .withColumn("current_funnel_stage",
        when(col("has_purchased") === 1, "PURCHASED")
          .when(col("has_clicked") === 1, "CLICKED")
          .when(col("has_viewed") === 1, "VIEWED")
          .when(col("has_signup") === 1, "SIGNED_UP")
          .otherwise("OTHER"))
      .orderBy(col("user_id"))
  }

  val oracleSql: String = SilverEvents.oracleCte +
    """
      |SELECT
      |  user_id,
      |  count(*) AS total_events,
      |  max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
      |  max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_viewed,
      |  max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_clicked,
      |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchased,
      |  min(CASE WHEN event_type = 'view' THEN event_date END) AS first_view_date,
      |  min(CASE WHEN event_type = 'purchase' THEN event_date END) AS first_purchase_date,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS total_purchases,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS total_spend,
      |  CAST(date_diff('day',
      |        min(CASE WHEN event_type = 'view' THEN event_date END),
      |        min(CASE WHEN event_type = 'purchase' THEN event_date END)) AS INT)
      |    AS days_view_to_purchase,
      |  CASE WHEN max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 THEN 'PURCHASED'
      |       WHEN max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1 THEN 'CLICKED'
      |       WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 THEN 'VIEWED'
      |       WHEN max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) = 1 THEN 'SIGNED_UP'
      |       ELSE 'OTHER' END AS current_funnel_stage
      |FROM silver
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin
}
