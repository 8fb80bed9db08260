package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg._

/** Gold: per-item performance. Adapted from reference
  * gold_product_performance.sql:8-67 — conditional counts/distincts
  * (A2/A3), conditional MIN/MAX first/last dates (A6), AVG via guarded
  * ratio (A8/A10), aggregate-then-derive second pass (A12), and the
  * CURRENT_DATE→asOf determinism swap (SURVEY §7.6 #1).
  *
  * Scale: single hash-agg shuffle on item_key (~100 distinct keys
  * here; at 100 TB the same plan holds — partial agg collapses each
  * map partition to ≤|items| rows before the shuffle).
  */
object ItemPerformance {

  def build(silver: DataFrame): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    val isView     = col("event_type") === "view"
    silver
      .filter(col("item_key").isNotNull)
      .groupBy(col("item_key"))
      .agg(
        countIf(isView).as("view_count"),
        countIf(col("event_type") === "click").as("click_count"),
        countIf(isPurchase).as("purchase_count"),
        countDistinctIf(isView, col("user_id")).as("unique_viewers"),
        countDistinctIf(isPurchase, col("user_id")).as("unique_buyers"),
        moneySumIf(isPurchase, col("price")).as("total_revenue"),
        min(when(isPurchase, col("event_date"))).as("first_purchase_date"),
        max(when(isPurchase, col("event_date"))).as("last_purchase_date"))
      .withColumn("avg_purchase_value", ratio(col("total_revenue"), col("purchase_count")))
      .withColumn("view_to_purchase_rate", pct(col("purchase_count"), col("view_count")))
      .withColumn("days_since_last_purchase",
        datediff(to_date(lit(Params.AsOfDate)), col("last_purchase_date")))
      .orderBy(col("item_key"))
  }

  val oracleSql: String = SilverEvents.oracleCte +
    s"""
      |SELECT
      |  item_key,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
      |  count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS unique_viewers,
      |  count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS unique_buyers,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS total_revenue,
      |  min(CASE WHEN event_type = 'purchase' THEN event_date END) AS first_purchase_date,
      |  max(CASE WHEN event_type = 'purchase' THEN event_date END) AS last_purchase_date,
      |  CAST(round(CAST(CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
      |        / nullif(CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 2) AS DOUBLE)
      |    AS avg_purchase_value,
      |  CAST(round(CAST(100.0 * CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
      |        / nullif(CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 2) AS DOUBLE)
      |    AS view_to_purchase_rate,
      |  CAST(date_diff('day', max(CASE WHEN event_type = 'purchase' THEN event_date END),
      |                 DATE '${Params.AsOfDate}') AS INT) AS days_since_last_purchase
      |FROM silver
      |WHERE item_key IS NOT NULL
      |GROUP BY item_key
      |ORDER BY item_key""".stripMargin
}
