package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg._

/** Gold: daily sales summary over silver events.
  *
  * Adapted from reference gold_daily_sales_summary.sql:10-60 — 1-key
  * GROUP BY with conditional sums/counts (A1-A3), conditional distinct
  * users, and NULLIF-guarded rates (A10). The reference's
  * view/cart/purchase event domain maps onto this dataset's
  * view/click/purchase/signup/error domain.
  *
  * Scale: single hash-aggregate shuffle on event_date; partial
  * aggregation (map-side combine) halves shuffle volume. The two
  * `countDistinctIf` columns expand to Spark's distinct-aggregate
  * rewrite (expand + two-phase agg) — still one shuffle; swap to
  * `approxCountDistinctIf` at 100 TB if exactness is negotiable.
  */
object DailySales {

  def build(silver: DataFrame): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    val isView     = col("event_type") === "view"
    silver.groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("total_events"),
        countIf(isView).as("view_count"),
        countIf(col("event_type") === "click").as("click_count"),
        countIf(isPurchase).as("purchase_count"),
        countIf(col("event_type") === "signup").as("signup_count"),
        countIf(col("event_type") === "error").as("error_count"),
        count_distinct(col("user_id")).as("unique_users"),
        countDistinctIf(isPurchase, col("user_id")).as("unique_buyers"),
        moneySumIf(isPurchase, col("price")).as("total_revenue"))
      .withColumn("avg_purchase_value", ratio(col("total_revenue"), col("purchase_count")))
      .withColumn("conversion_rate", pct(col("purchase_count"), col("view_count")))
      .withColumn("revenue_per_user", ratio(col("total_revenue"), col("unique_users")))
      .orderBy(col("event_date"))
  }

  /** 100 TB variant: distinct users via HyperLogLog++ sketches
    * (mergeable single-pass partials — no distinct-expand shuffle).
    * Deterministic for fixed input/rsd but not oracle-portable →
    * rows-only check; DailySalesApproxSpec bounds it against exact. */
  def buildApprox(silver: DataFrame, rsd: Double = 0.02): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    silver.groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("total_events"),
        countIf(isPurchase).as("purchase_count"),
        approx_count_distinct(col("user_id"), rsd).as("unique_users"),
        approxCountDistinctIf(isPurchase, col("user_id"), rsd).as("unique_buyers"),
        moneySumIf(isPurchase, col("price")).as("total_revenue"))
      .orderBy(col("event_date"))
  }

  /** Error-bound report gating [[buildApprox]] against [[build]]: per
    * shared metric, the day count and the number of days where the
    * approx value leaves its bound (exact equality for the pass-through
    * counts/revenue; `relBound` relative error for the two HLL
    * distinct-counts). All values are deterministic for a fixed input
    * and rsd, and the DuckDB oracle recomputes `n_days` exactly and
    * pins `n_out_of_bound` at zero — so CORRECTNESS carries a green
    * hash row for the approx mart instead of a rows-only entry, and
    * any sketch regression turns the row red. */
  def approxErrorReport(silver: DataFrame, relBound: Double = 0.05): DataFrame = {
    val exact = build(silver).select(col("event_date"),
      col("total_events").as("x_events"), col("purchase_count").as("x_purchases"),
      col("unique_users").as("x_users"), col("unique_buyers").as("x_buyers"),
      col("total_revenue").as("x_revenue"))
    val approx = buildApprox(silver).select(col("event_date"),
      col("total_events").as("a_events"), col("purchase_count").as("a_purchases"),
      col("unique_users").as("a_users"), col("unique_buyers").as("a_buyers"),
      col("total_revenue").as("a_revenue"))
    def relErr(a: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =
      abs(a.cast("double") - x.cast("double")) / greatest(x.cast("double"), lit(1.0))
    val oob = exact.join(approx, "event_date").agg(
      count(lit(1)).as("n_days"),
      countIf(col("a_events") =!= col("x_events")).as("oob_total_events"),
      countIf(col("a_purchases") =!= col("x_purchases")).as("oob_purchase_count"),
      countIf(col("a_revenue") =!= col("x_revenue")).as("oob_total_revenue"),
      countIf(relErr(col("a_users"), col("x_users")) > relBound).as("oob_unique_users"),
      countIf(relErr(col("a_buyers"), col("x_buyers")) > relBound).as("oob_unique_buyers"))
    oob.unpivot(
        Array(col("n_days")),
        Seq("oob_total_events", "oob_purchase_count", "oob_total_revenue",
          "oob_unique_users", "oob_unique_buyers").map(col).toArray,
        "metric", "n_out_of_bound")
      .withColumn("metric", regexp_replace(col("metric"), "^oob_", ""))
      .select("metric", "n_days", "n_out_of_bound")
      .orderBy("metric")
  }

  /** Oracle for [[approxErrorReport]]: n_days exactly, zero
    * out-of-bound days per metric. */
  val approxErrorReportSql: String = SilverEvents.oracleCte + """
      |, d AS (SELECT count(DISTINCT event_date) AS n_days FROM silver)
      |SELECT m.metric, d.n_days, CAST(0 AS BIGINT) AS n_out_of_bound
      |FROM d, (VALUES ('total_events'), ('purchase_count'), ('total_revenue'),
      |                ('unique_users'), ('unique_buyers')) AS m(metric)
      |ORDER BY metric""".stripMargin

  private val countMetrics = Seq("total_events", "view_count", "click_count",
    "purchase_count", "signup_count", "error_count", "unique_users", "unique_buyers")

  /** Wide→long melt of the daily count metrics (`Dataset.unpivot`, the
    * relational UNPIVOT/melt operator): one row per (date, metric).
    * Value columns must share a type — the eight counts are all
    * BIGINT; the derived DOUBLE ratios stay wide. */
  def unpivotMetrics(daily: DataFrame): DataFrame =
    daily.unpivot(
        Array(col("event_date")),
        countMetrics.map(col).toArray,
        "metric", "value")
      .orderBy(col("event_date"), col("metric"))

  val unpivotMetricsSql: String = SilverEvents.oracleCte + """,
      |daily AS (
      |  SELECT event_date,
      |    count(*) AS total_events,
      |    count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
      |    count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
      |    count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_count,
      |    count(CASE WHEN event_type = 'error' THEN 1 END) AS error_count,
      |    count(DISTINCT user_id) AS unique_users,
      |    count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS unique_buyers
      |  FROM silver GROUP BY event_date
      |)
      |SELECT event_date, metric, value FROM (
      |  SELECT event_date, 'total_events' AS metric, total_events AS value FROM daily
      |  UNION ALL SELECT event_date, 'view_count', view_count FROM daily
      |  UNION ALL SELECT event_date, 'click_count', click_count FROM daily
      |  UNION ALL SELECT event_date, 'purchase_count', purchase_count FROM daily
      |  UNION ALL SELECT event_date, 'signup_count', signup_count FROM daily
      |  UNION ALL SELECT event_date, 'error_count', error_count FROM daily
      |  UNION ALL SELECT event_date, 'unique_users', unique_users FROM daily
      |  UNION ALL SELECT event_date, 'unique_buyers', unique_buyers FROM daily
      |)
      |ORDER BY event_date, metric""".stripMargin

  /** The daily aggregate's SQL body over a named relation — reused by
    * the MERGE-restatement oracle, which runs it over two different
    * silver CTEs. */
  def aggSqlOver(from: String): String =
    """SELECT
      |  event_date,
      |  count(*) AS total_events,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
      |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_count,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error_count,
      |  count(DISTINCT user_id) AS unique_users,
      |  count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS unique_buyers,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS total_revenue,
      |  CAST(round(CAST(CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
      |        / nullif(CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 2) AS DOUBLE)
      |    AS avg_purchase_value,
      |  CAST(round(CAST(100.0 * CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
      |        / nullif(CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 2) AS DOUBLE)
      |    AS conversion_rate,
      |  CAST(round(CAST(CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
      |        / nullif(CAST(count(DISTINCT user_id) AS DOUBLE), 0)
      |      AS DECIMAL(28,10)), 2) AS DOUBLE) AS revenue_per_user
      |FROM """.stripMargin + from + """
      |GROUP BY event_date""".stripMargin

  val oracleSql: String =
    SilverEvents.oracleCte + "\n" + aggSqlOver("silver") + "\nORDER BY event_date"

  /** EWMA-smoothed daily revenue (α = 0.3, EWMA₁ = x₁): the classic
    * time-series smoother, computed as an explicit sequential fold
    * over each day's ordered revenue history so Spark's
    * `aggregate(slice(hist, 2, …), hist[1], …)` and DuckDB's
    * `list_reduce(hist, …)` run the IDENTICAL recurrence in the
    * identical order — bit-for-bit doubles, then one portable round.
    *
    * Scale: the EWMA input is the POST-aggregation daily series
    * (≤ |days| rows at any SF — the aggregation shuffle happened in
    * [[build]]'s shape), so the unpartitioned ordered window holding
    * the running history is the benign aggregated-frame class
    * (SCALE.md); the recurrence itself forbids partitioning.
    *
    * GRAIN CONTRACT: the running collect_list is O(|series|²) values
    * through one task, bounded by the CALENDAR at daily grain (10
    * years = 3 653 rows ≈ 6.7 M doubles peak — proven by the 10-year
    * spine test in MartsSpec). Do NOT reuse this operator at
    * hour/minute grain or per-entity without first aggregating to a
    * calendar-bounded series per window partition; for an unbounded
    * series, switch to the two-pass closed form (prefix sums of
    * x_i/(1−α)^i) partitioned by entity. */
  def ewmaDailyRevenue(silver: DataFrame, alpha: Double = 0.3): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    val daily = silver.groupBy(col("event_date"))
      .agg(moneySumIf(isPurchase, col("price")).as("revenue"))
    // UNPARTITIONED by design and SIZE-BOUNDED (r19 window audit): the
    // window runs over the per-date aggregate — |dates| rows (30 at
    // any SF; ≤3 653 for a 10-year daily calendar, see the grain
    // contract above), never over |events|. The single-partition
    // WindowExec warning is benign here; any finer grain must
    // partition by entity first.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("event_date"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    daily
      .withColumn("hist", collect_list(col("revenue")).over(w))
      // r19: native EwmaFold (same doubles, same order — the r18
      // EwmaScan swap, applied to this remaining interpreted
      // `aggregate` fold; O(|series|²) lambda dispatches otherwise)
      .withColumn("ewma_revenue", roundPortable(
        org.apache.spark.sql.graftext.VectorCodec.ewmaFold(
          slice(col("hist"), lit(2), size(col("hist"))),
          element_at(col("hist"), 1), alpha), 4))
      .select(col("event_date"), col("revenue"), col("ewma_revenue"))
      .orderBy(col("event_date"))
  }

  val ewmaDailyRevenueSql: String = SilverEvents.oracleCte + s"""
    |, daily AS (
    |  SELECT event_date,
    |    CAST(round(sum(CASE WHEN event_type = 'purchase'
    |                        THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
    |                        ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS revenue
    |  FROM silver GROUP BY event_date
    |), hist AS (
    |  SELECT event_date, revenue,
    |    list(revenue) OVER (ORDER BY event_date
    |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
    |  FROM daily
    |)
    |SELECT event_date, revenue,
    |  ${graft.ops.ConditionalAgg.roundPortableSql(
          "list_reduce(h, (acc, x) -> 0.3 * x + 0.7 * acc)", 4)} AS ewma_revenue
    |FROM hist
    |ORDER BY event_date""".stripMargin
}
