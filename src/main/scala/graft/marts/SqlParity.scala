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

  /** gold_user_journey_funnel.sql:15-60 as executed SQL text — the
    * reference's CTE shape (per-user stage flags from MAX(CASE),
    * first-touch dates from MIN(CASE), DATEDIFF journey metric, a
    * CASE-ladder funnel stage) under the same adaptations as the
    * other parity models: view/cart/purchase retail stages map onto
    * this dataset's signup/view/click/purchase domain,
    * `CURRENT_TIMESTAMP() AS _updated_at` dropped, money through the
    * portable decimal idiom. Shares [[UserJourneyFunnel]]'s oracle. */
  def sqlGoldUserJourneyFunnel(s: SparkSession, silver: DataFrame): DataFrame = {
    withSilverView(s, silver)
    s.sql(
      s"""WITH user_events AS (
         |    SELECT
         |        user_id,
         |        count(*) AS total_events,
         |
         |        -- Stage flags (reference: has_viewed/has_added_to_cart/has_purchased)
         |        max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
         |        max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_viewed,
         |        max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_clicked,
         |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchased,
         |
         |        -- First-touch dates (reference: first_view/cart/purchase_date)
         |        min(CASE WHEN event_type = 'view' THEN event_date END) AS first_view_date,
         |        min(CASE WHEN event_type = 'purchase' THEN event_date END) AS first_purchase_date,
         |
         |        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS total_purchases,
         |        $moneyRevenue AS total_spend
         |    FROM $SilverView
         |    GROUP BY user_id
         |)
         |SELECT
         |    user_id, total_events, has_signup, has_viewed, has_clicked,
         |    has_purchased, first_view_date, first_purchase_date,
         |    total_purchases, total_spend,
         |
         |    -- Time analysis (reference: DATEDIFF(first_purchase, first_view))
         |    CAST(datediff(first_purchase_date, first_view_date) AS INT)
         |      AS days_view_to_purchase,
         |
         |    -- Funnel stage CASE ladder (reference:
         |    -- repeat_buyer/purchaser/cart_abandoner/browser ladder)
         |    CASE WHEN has_purchased = 1 THEN 'PURCHASED'
         |         WHEN has_clicked = 1 THEN 'CLICKED'
         |         WHEN has_viewed = 1 THEN 'VIEWED'
         |         WHEN has_signup = 1 THEN 'SIGNED_UP'
         |         ELSE 'OTHER' END AS current_funnel_stage
         |FROM user_events
         |ORDER BY user_id""".stripMargin)
  }

  /** gold_category_performance.sql:10-88 as executed SQL text — the
    * reference's JOIN-shaped model (category daily metrics ⟕ top-1
    * item per group via ROW_NUMBER, 3-key SQL-equality LEFT JOIN with
    * the NULLable category_level_2 never matching — the J1 NULL-key
    * semantics) under the standard adaptations. Shares
    * [[CategoryPerformance]]'s oracle, so the SQL path must agree
    * with the DataFrame path bit-for-bit. */
  def sqlGoldCategoryPerformance(s: SparkSession, silver: DataFrame): DataFrame = {
    withSilverView(s, silver)
    s.sql(
      s"""WITH cat AS (
         |    SELECT event_date, event_type, user_id, item_key, price,
         |        concat('cat_', CAST(item_key % 10 AS STRING)) AS category_level_1,
         |        CASE WHEN item_key % 7 = 0 THEN CAST(NULL AS STRING)
         |             ELSE concat('sub_', CAST(item_key % 3 AS STRING))
         |        END AS category_level_2
         |    FROM $SilverView
         |),
         |cat_daily AS (
         |    SELECT event_date, category_level_1, category_level_2,
         |        count(*) AS total_events,
         |        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
         |        count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS unique_buyers,
         |        $moneyRevenue AS category_revenue
         |    FROM cat
         |    WHERE category_level_1 IS NOT NULL
         |    GROUP BY event_date, category_level_1, category_level_2
         |),
         |item_daily AS (
         |    SELECT event_date, category_level_1, category_level_2, item_key,
         |        $moneyRevenue AS item_revenue
         |    FROM cat
         |    WHERE event_type = 'purchase' AND item_key IS NOT NULL
         |    GROUP BY event_date, category_level_1, category_level_2, item_key
         |),
         |top_item AS (
         |    SELECT event_date AS top_event_date,
         |        category_level_1 AS top_category_level_1,
         |        category_level_2 AS top_category_level_2,
         |        item_key AS top_item_key, item_revenue AS top_item_revenue
         |    FROM (
         |        SELECT *,
         |            row_number() OVER (
         |                PARTITION BY event_date, category_level_1, category_level_2
         |                ORDER BY item_revenue DESC, item_key ASC) AS rn
         |        FROM item_daily)
         |    WHERE rn = 1
         |)
         |SELECT d.event_date, d.category_level_1, d.category_level_2,
         |    d.total_events, d.purchase_count, d.unique_buyers,
         |    d.category_revenue, t.top_item_key, t.top_item_revenue
         |FROM cat_daily d
         |LEFT JOIN top_item t
         |    ON d.event_date = t.top_event_date
         |   AND d.category_level_1 = t.top_category_level_1
         |   AND d.category_level_2 = t.top_category_level_2
         |ORDER BY d.event_date, d.category_level_1, d.category_level_2""".stripMargin)
  }

  /** gold_conversion_funnel_daily.sql as executed SQL text — the
    * reference's per-day-and-segment DISTINCT-user funnel (stage
    * users from COUNT(DISTINCT CASE), HAVING-style stage-1 guard,
    * NULLIF-guarded stage-to-stage rates) under the standard
    * adaptations. Shares [[ConversionFunnelDaily]]'s oracle. */
  def sqlGoldConversionFunnelDaily(s: SparkSession, silver: DataFrame): DataFrame = {
    withSilverView(s, silver)
    def rate(num: String, den: String) = portableRound(
      s"100.0 * CAST($num AS DOUBLE) / NULLIF(CAST($den AS DOUBLE), 0)")
    s.sql(
      s"""SELECT * FROM (
         |    SELECT
         |        event_date, day_of_week_num, is_weekend, time_of_day, price_bucket,
         |        count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS stage_1_view_users,
         |        count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS stage_2_click_users,
         |        count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS stage_3_purchase_users,
         |        count(*) AS total_events,
         |        $moneyRevenue AS funnel_revenue,
         |        ${rate("count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)",
                        "count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)")} AS view_to_click_rate,
         |        ${rate("count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)",
                        "count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)")} AS click_to_purchase_rate,
         |        ${rate("count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)",
                        "count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END)")} AS overall_conversion_rate
         |    FROM $SilverView
         |    GROUP BY event_date, day_of_week_num, is_weekend, time_of_day, price_bucket
         |)
         |WHERE stage_1_view_users > 0
         |ORDER BY event_date, time_of_day, price_bucket""".stripMargin)
  }

  /** gold_product_performance.sql as executed SQL text — per-item
    * lifetime metrics with the reference's `CURRENT_DATE` recency
    * replaced by the explicit `Params.AsOfDate` (SURVEY §7.6 #1).
    * Shares [[ItemPerformance]]'s oracle. */
  def sqlGoldItemPerformance(s: SparkSession, silver: DataFrame): DataFrame = {
    withSilverView(s, silver)
    val purchases = "count(CASE WHEN event_type = 'purchase' THEN 1 END)"
    s.sql(
      s"""SELECT
         |    item_key,
         |    count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
         |    count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
         |    $purchases AS purchase_count,
         |    count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS unique_viewers,
         |    count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS unique_buyers,
         |    $moneyRevenue AS total_revenue,
         |    min(CASE WHEN event_type = 'purchase' THEN event_date END) AS first_purchase_date,
         |    max(CASE WHEN event_type = 'purchase' THEN event_date END) AS last_purchase_date,
         |    ${portableRound(
              s"CAST($moneyRevenue AS DOUBLE) / NULLIF(CAST($purchases AS DOUBLE), 0)")} AS avg_purchase_value,
         |    ${portableRound(
              s"100.0 * CAST($purchases AS DOUBLE) / NULLIF(CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE), 0)")} AS view_to_purchase_rate,
         |    CAST(datediff(DATE '${Params.AsOfDate}',
         |         max(CASE WHEN event_type = 'purchase' THEN event_date END)) AS INT)
         |      AS days_since_last_purchase
         |FROM $SilverView
         |WHERE item_key IS NOT NULL
         |GROUP BY item_key
         |ORDER BY item_key""".stripMargin)
  }

  /** The FOUNDATIONAL dbt model — silver_ecommerce_events.sql:24-123 —
    * as executed SQL text over the RAW events table: md5 surrogate
    * key over coalesced natural columns, lower/trim normalization,
    * timestamp→date/hour/dow derivations, price guard + bucket CASE
    * ladder, NULL-user filter, and the W1 ROW_NUMBER dedup (with the
    * deterministic tie-breaker of SURVEY §7.6 #2). Shares
    * [[SilverEvents]]'s oracle, so the SQL text must reproduce the
    * DataFrame silver bit-for-bit. Note Spark `dayofweek` is
    * 1=Sunday; weekend = {1,7} (the oracle shims DuckDB's 0=Sunday). */
  def sqlSilverEvents(s: SparkSession, rawEvents: DataFrame): DataFrame = {
    rawEvents.createOrReplaceTempView("graft_raw_events")
    s.sql(
      s"""SELECT event_unique_id, event_id, event_time_str, event_date,
         |       event_hour, day_of_week_num, is_weekend, time_of_day,
         |       event_type, user_id, item_key, price, price_bucket
         |FROM (
         |    SELECT *,
         |        row_number() OVER (PARTITION BY event_unique_id
         |                           ORDER BY ts DESC, event_id ASC) AS rn
         |    FROM (
         |        SELECT
         |            md5(concat_ws('|', CAST(event_id AS STRING),
         |                coalesce(CAST(user_id AS STRING), 'NULL'),
         |                lower(trim(event_type)),
         |                date_format(ts, 'yyyy-MM-dd HH:mm:ss'))) AS event_unique_id,
         |            event_id,
         |            date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS event_time_str,
         |            to_date(ts) AS event_date,
         |            CAST(hour(ts) AS INT) AS event_hour,
         |            CAST(dayofweek(ts) AS INT) AS day_of_week_num,
         |            dayofweek(ts) IN (1, 7) AS is_weekend,
         |            CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'MORNING'
         |                 WHEN hour(ts) BETWEEN 12 AND 17 THEN 'AFTERNOON'
         |                 WHEN hour(ts) BETWEEN 18 AND 21 THEN 'EVENING'
         |                 ELSE 'NIGHT' END AS time_of_day,
         |            lower(trim(event_type)) AS event_type,
         |            user_id,
         |            CAST(nullif(regexp_extract(props, '([0-9]+)', 1), '') AS INT) AS item_key,
         |            CASE WHEN value >= 0 THEN round(value, 2) END AS price,
         |            CASE WHEN value IS NULL OR value < 0 THEN 'UNKNOWN'
         |                 WHEN round(value, 2) < 50 THEN '0-50'
         |                 WHEN round(value, 2) < 100 THEN '50-100'
         |                 WHEN round(value, 2) < 200 THEN '100-200'
         |                 WHEN round(value, 2) < 500 THEN '200-500'
         |                 ELSE '500+' END AS price_bucket,
         |            ts
         |        FROM graft_raw_events
         |        WHERE user_id IS NOT NULL
         |    )
         |)
         |WHERE rn = 1
         |ORDER BY event_id""".stripMargin)
  }

  /** gold_user_rfm_segments.sql:7-99 as executed SQL text — the one
    * model every earlier round EXCLUDED from the parity surface
    * (MIGRATION.md documents why). Running it closes the exclusion
    * honestly: the reference's literal CTE chain (per-user purchase
    * aggregates with `WHERE user_id IS NOT NULL` + `HAVING` purchase
    * guard → `NTILE(5) OVER (ORDER BY …)` ×3 → CASE segment ladder)
    * executes as text, DEMONSTRATING the wart the exclusion was about:
    * each partition-less NTILE funnels the |users|-sized frame through
    * a single-partition window — fine at this SF, a scale-killer at
    * 100 TB. [[RfmSegments.build]] (distributed-exact GlobalRank)
    * stays the engine path; this is the parity wart exhibit.
    *
    * Adaptations beyond the standard set (view name, `_updated_at`
    * dropped, money through DECIMAL(18,2)), each forced:
    *  - `CURRENT_DATE()` → the repo-wide pinned as-of date
    *    ([[Params.AsOfDate]]) — wall-clock recency is
    *    nondeterministic and the harness hashes values;
    *  - NTILE tie-break `, user_id` appended (SURVEY §7.6 #2 — the
    *    reference's bare ORDER BY metric is nondeterministic under
    *    ties) and score orientation flipped to the mart's documented
    *    5=best convention, mirrored in the shared oracle;
    *  - segment vocabulary + CASE thresholds are the mart's serving
    *    contract (same domain mapping every parity model documents);
    *  - `first_purchase_date` / `avg_order_value` are computed in the
    *    CTEs (literal text) but not projected — the mart's serving
    *    schema, which the shared oracle pins; `COUNT(DISTINCT
    *    user_session)` is dropped outright — the events table has no
    *    session column (sessions are synthesized by gap in
    *    q_sessionize, a different surface);
    *  - final `ORDER BY monetary_value DESC` → `ORDER BY user_id`
    *    (deterministic total order; monetary ties make the
    *    reference's order hash-unstable).
    *
    * Shares [[RfmSegments]]'s oracle — the SQL text must reproduce
    * the GlobalRank path bit-for-bit or the row goes red. */
  def sqlGoldUserRfmSegments(s: SparkSession, silver: DataFrame): DataFrame = {
    withSilverView(s, silver)
    s.sql(
      s"""WITH user_purchase_history AS (
         |    SELECT
         |        user_id,
         |
         |        MIN(CASE WHEN event_type = 'purchase' THEN event_date END) AS first_purchase_date,
         |        MAX(CASE WHEN event_type = 'purchase' THEN event_date END) AS last_purchase_date,
         |
         |        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS frequency,
         |        round(SUM(CASE WHEN event_type = 'purchase'
         |                       THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
         |                       ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS monetary_value,
         |
         |        -- (reference also counts DISTINCT user_session here;
         |        --  this dataset has no session column — see scaladoc)
         |
         |        -- Recency (days since last purchase; pinned as-of date)
         |        DATEDIFF(
         |            DATE '${Params.AsOfDate}',
         |            MAX(CASE WHEN event_type = 'purchase' THEN event_date END)
         |        ) AS recency_days
         |
         |    FROM $SilverView
         |    WHERE user_id IS NOT NULL
         |    GROUP BY user_id
         |    HAVING COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
         |),
         |
         |rfm_base AS (
         |    SELECT
         |        *,
         |        ${portableRound(
                   "CAST(monetary_value AS DOUBLE) / NULLIF(CAST(frequency AS DOUBLE), 0)")} AS avg_order_value
         |    FROM user_purchase_history
         |),
         |
         |rfm_scores AS (
         |    SELECT
         |        *,
         |
         |        -- Quantile-based RFM scores (1–5; 5 = best, tie-broken)
         |        NTILE(5) OVER (ORDER BY recency_days DESC, user_id ASC)   AS rfm_recency_score,
         |        NTILE(5) OVER (ORDER BY frequency ASC, user_id ASC)       AS rfm_frequency_score,
         |        NTILE(5) OVER (ORDER BY monetary_value ASC, user_id ASC)  AS rfm_monetary_score
         |
         |    FROM rfm_base
         |),
         |
         |with_segments AS (
         |    SELECT
         |        *,
         |
         |        CASE
         |            WHEN rfm_recency_score >= 4
         |             AND rfm_frequency_score >= 4
         |             AND rfm_monetary_score >= 4
         |                THEN 'CHAMPION'
         |
         |            WHEN rfm_recency_score >= 3
         |             AND rfm_frequency_score >= 3
         |                THEN 'LOYAL'
         |
         |            WHEN rfm_recency_score >= 4
         |             AND rfm_frequency_score <= 2
         |                THEN 'NEW_CUSTOMER'
         |
         |            WHEN rfm_recency_score <= 2
         |             AND rfm_frequency_score >= 3
         |                THEN 'AT_RISK'
         |
         |            WHEN rfm_recency_score <= 2
         |             AND rfm_frequency_score <= 2
         |                THEN 'HIBERNATING'
         |
         |            ELSE 'REGULAR'
         |        END AS rfm_segment,
         |
         |        -- Approximate CLV
         |        CAST(round(monetary_value * CAST(1.5 AS DECIMAL(2,1)), 2) AS DOUBLE) AS customer_lifetime_value
         |
         |    FROM rfm_scores
         |)
         |
         |SELECT
         |    user_id, last_purchase_date, recency_days, frequency,
         |    CAST(monetary_value AS DOUBLE) AS monetary,
         |    rfm_recency_score AS r_score,
         |    rfm_frequency_score AS f_score,
         |    rfm_monetary_score AS m_score,
         |    rfm_segment,
         |    customer_lifetime_value AS clv_estimate
         |FROM with_segments
         |ORDER BY user_id""".stripMargin)
  }
}
