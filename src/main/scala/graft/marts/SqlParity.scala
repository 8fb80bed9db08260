package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}

/** E2: the reference's dbt models run as LITERAL SQL TEXT through
  * `spark.sql` over a registered silver view — proving the engine
  * executes the reference's own query shape (CTE + conditional
  * aggregates + NULLIF-guarded ROUND ratios + ORDER BY), not just a
  * DataFrame re-expression of it.
  *
  * Adapted mechanically from
  * `/root/reference/dbt/target/run/ecommerce_lakehouse/models/gold/
  * core/gold_daily_sales_summary.sql:10-60` and
  * `.../traffic/gold_hourly_traffic.sql` — the adaptations, each
  * forced and documented:
  *  - table ref `silver.silver_ecommerce_events` → the registered
  *    temp view (the dbt relation name is warehouse config);
  *  - the reference's view/cart/purchase retail domain maps onto this
  *    dataset's view/click/purchase/signup/error event domain (the
  *    same mapping every mart documents);
  *  - `CURRENT_TIMESTAMP() AS _updated_at` dropped (nondeterministic
  *    audit column — the correctness harness hashes values);
  *  - ROUND(x, 2) routed through DECIMAL(28,10) (ConditionalAgg
  *    .roundPortable's SQL form) so the SQL path is bit-identical to
  *    the DataFrame path AND the DuckDB oracle — plain double ROUND
  *    resolves ties differently per engine;
  *  - the `create table … using parquet partitioned by` CTAS header is
  *    the DDL half, exercised separately by [[graft.sink.SqlDdl]].
  *
  * Both queries share the DataFrame marts' oracles — the driver
  * hash-compares the SQL-text path against the exact same DuckDB
  * result that [[DailySales.build]] / [[HourlyTraffic.build]] must
  * match, so any divergence between the two paths turns a row red. */
object SqlParity {

  private val SilverView = "graft_silver_events"

  /** Register `silver` once per session under the parity view name. */
  private def withSilverView(s: SparkSession, silver: DataFrame): Unit =
    silver.createOrReplaceTempView(SilverView)

  private val moneyRevenue =
    """CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                    THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                    ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)""".stripMargin

  private def portableRound(expr: String): String =
    s"CAST(round(CAST($expr AS DECIMAL(28,10)), 2) AS DOUBLE)"

  /** gold_daily_sales_summary.sql:10-60 as executed SQL text. */
  def sqlGoldDailySales(s: SparkSession, silver: DataFrame): DataFrame = {
    withSilverView(s, silver)
    s.sql(
      s"""WITH daily_metrics AS (
         |    SELECT
         |        event_date,
         |
         |        -- Traffic metrics (reference: view/cart counts)
         |        count(*) AS total_events,
         |        count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
         |        count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
         |        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
         |        count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_count,
         |        count(CASE WHEN event_type = 'error' THEN 1 END) AS error_count,
         |        count(DISTINCT user_id) AS unique_users,
         |        count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS unique_buyers,
         |
         |        -- Revenue metrics
         |        $moneyRevenue AS total_revenue
         |    FROM $SilverView
         |    GROUP BY event_date
         |)
         |SELECT
         |    event_date, total_events, view_count, click_count, purchase_count,
         |    signup_count, error_count, unique_users, unique_buyers, total_revenue,
         |
         |    -- Average order value (reference: ROUND(revenue / NULLIF(orders, 0), 2))
         |    ${portableRound(
               "CAST(total_revenue AS DOUBLE) / NULLIF(CAST(purchase_count AS DOUBLE), 0)")} AS avg_purchase_value,
         |
         |    -- Conversion rate (reference: purchases * 100.0 / NULLIF(views, 0))
         |    ${portableRound(
               "100.0 * CAST(purchase_count AS DOUBLE) / NULLIF(CAST(view_count AS DOUBLE), 0)")} AS conversion_rate,
         |
         |    ${portableRound(
               "CAST(total_revenue AS DOUBLE) / NULLIF(CAST(unique_users AS DOUBLE), 0)")} AS revenue_per_user
         |FROM daily_metrics
         |ORDER BY event_date""".stripMargin)
  }

  /** gold_hourly_traffic.sql as executed SQL text (same adaptations). */
  def sqlGoldHourlyTraffic(s: SparkSession, silver: DataFrame): DataFrame = {
    withSilverView(s, silver)
    s.sql(
      s"""WITH hourly AS (
         |    SELECT
         |        event_date, event_hour, time_of_day, is_weekend,
         |        count(*) AS total_events,
         |        count(DISTINCT user_id) AS unique_users,
         |        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
         |        $moneyRevenue AS hourly_revenue
         |    FROM $SilverView
         |    GROUP BY event_date, event_hour, time_of_day, is_weekend
         |)
         |SELECT *,
         |    ${portableRound(
               "CAST(total_events AS DOUBLE) / NULLIF(CAST(unique_users AS DOUBLE), 0)")} AS events_per_user
         |FROM hourly
         |ORDER BY event_date, event_hour""".stripMargin)
  }
}
