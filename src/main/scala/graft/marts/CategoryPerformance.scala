package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{ConditionalAgg, TopK}
import ConditionalAgg._

/** Gold: category performance with top item — the suite's only join.
  * Adapted from reference gold_category_performance.sql:10-88:
  * category daily metrics (3-key A9) ⟕ top-1 item per group (W2
  * rank-window), 3-key equi LEFT OUTER join (J1).
  *
  * NULL-key semantics preserved (SURVEY §2.3): category_level_2 is
  * NULLable and the join uses plain SQL equality — NULL keys never
  * match, so those rows carry NULL top_item_key (no `<=>`).
  *
  * Scale: the top-item side aggregates to ≤|date×cat1×cat2| rows, so
  * it's explicitly `broadcast()` — no shuffle for the join; the two
  * upstream aggregates reuse one exchange of silver when AQE reuses
  * subplans; rank-limit pushdown (WindowGroupLimit) keeps the top-1
  * window cheap.
  */
object CategoryPerformance {

  /** Category hierarchy derived from item_key (adapter for the
    * reference's SPLIT(category_code) levels — FIXTURES §4); level 2 is
    * deliberately NULL for item_key % 7 == 0 to exercise NULL-key join
    * semantics like the reference's nullable category_level_2. */
  def withCategories(silver: DataFrame): DataFrame = silver
    .withColumn("category_level_1", concat(lit("cat_"), (col("item_key") % 10).cast("string")))
    .withColumn("category_level_2",
      when(col("item_key") % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("sub_"), (col("item_key") % 3).cast("string"))))

  def build(silver: DataFrame): DataFrame = {
    val cat = withCategories(silver).filter(col("category_level_1").isNotNull)
    val isPurchase = col("event_type") === "purchase"

    val catDaily = cat.groupBy(col("event_date"), col("category_level_1"), col("category_level_2"))
      .agg(
        count(lit(1)).as("total_events"),
        countIf(isPurchase).as("purchase_count"),
        countDistinctIf(isPurchase, col("user_id")).as("unique_buyers"),
        moneySumIf(isPurchase, col("price")).as("category_revenue"))

    val itemDaily = cat.filter(isPurchase && col("item_key").isNotNull)
      .groupBy(col("event_date"), col("category_level_1"), col("category_level_2"), col("item_key"))
      .agg(moneySumIf(isPurchase, col("price")).as("item_revenue"))

    // Both sides derive from the same `cat` lineage, so join keys are
    // renamed on the top-item side (top_event_date, ...) before the join:
    // with shared-lineage attribute ids, `catDaily("k") === topItem("k")`
    // is the ambiguous-self-join trap (Spark resolves both sides to the
    // same attribute and warns "trivially true equals predicate").
    val topItem = TopK.perGroup(itemDaily,
        Seq("event_date", "category_level_1", "category_level_2"),
        order = Seq(col("item_revenue").desc, col("item_key").asc), k = 1)
      .select(col("event_date").as("top_event_date"),
        col("category_level_1").as("top_category_level_1"),
        col("category_level_2").as("top_category_level_2"),
        col("item_key").as("top_item_key"), col("item_revenue").as("top_item_revenue"))

    catDaily
      .join(broadcast(topItem),
        col("event_date") === col("top_event_date") &&
          col("category_level_1") === col("top_category_level_1") &&
          col("category_level_2") === col("top_category_level_2"),
        "left")
      .select(col("event_date"), col("category_level_1"), col("category_level_2"),
        col("total_events"), col("purchase_count"), col("unique_buyers"),
        col("category_revenue"), col("top_item_key"), col("top_item_revenue"))
      .orderBy(col("event_date"), col("category_level_1"), col("category_level_2"))
  }

  /** DuckDB category derivation shared with [[FunnelDaily]]-style CTEs. */
  private val catCte: String =
    """, cat AS (
      |  SELECT *,
      |    concat('cat_', CAST(item_key % 10 AS VARCHAR)) AS category_level_1,
      |    CASE WHEN item_key % 7 = 0 THEN NULL
      |         ELSE concat('sub_', CAST(item_key % 3 AS VARCHAR)) END AS category_level_2
      |  FROM silver
      |)""".stripMargin

  val oracleSql: String = SilverEvents.oracleCte + catCte +
    """
      |, cat_daily AS (
      |  SELECT
      |    event_date, category_level_1, category_level_2,
      |    count(*) AS total_events,
      |    count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
      |    count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS unique_buyers,
      |    CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                        THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
      |                        ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS category_revenue
      |  FROM cat WHERE category_level_1 IS NOT NULL
      |  GROUP BY event_date, category_level_1, category_level_2
      |), item_daily AS (
      |  SELECT
      |    event_date, category_level_1, category_level_2, item_key,
      |    CAST(round(sum(CAST(coalesce(price, 0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS item_revenue
      |  FROM cat
      |  WHERE event_type = 'purchase' AND item_key IS NOT NULL AND category_level_1 IS NOT NULL
      |  GROUP BY event_date, category_level_1, category_level_2, item_key
      |), top_item AS (
      |  SELECT event_date, category_level_1, category_level_2,
      |         item_key AS top_item_key, item_revenue AS top_item_revenue
      |  FROM (
      |    SELECT *, row_number() OVER (
      |        PARTITION BY event_date, category_level_1, category_level_2
      |        ORDER BY item_revenue DESC, item_key ASC) AS rnk
      |    FROM item_daily
      |  ) WHERE rnk = 1
      |)
      |SELECT
      |  d.event_date, d.category_level_1, d.category_level_2,
      |  d.total_events, d.purchase_count, d.unique_buyers, d.category_revenue,
      |  t.top_item_key, t.top_item_revenue
      |FROM cat_daily d
      |LEFT JOIN top_item t
      |  ON d.event_date = t.event_date
      | AND d.category_level_1 = t.category_level_1
      | AND d.category_level_2 = t.category_level_2
      |ORDER BY d.event_date, d.category_level_1, d.category_level_2""".stripMargin
}
