package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg._
import graft.sources.Tables

/** Surface-completeness queries beyond the reference's own inventory
  * (SURVEY §2.7 notes INTERSECT/EXCEPT/rollup "absent" — a user of a
  * general engine still expects them): multi-level ROLLUP, set
  * intersection/difference, pivot, the full rank-window family, and
  * JSON extraction.
  */
object CoverageQueries {

  /** GROUP BY ROLLUP over (event_type, price_bucket) with grouping
    * flags — subtotal + grand-total rows. One expand + hash agg;
    * rollup multiplies shuffle rows by (#levels+1), which is the
    * standard cost and still one exchange. */
  def rollupSales(s: SparkSession, dir: String): DataFrame = {
    val silver = SilverEvents.build(Tables.events(s, dir))
    silver.filter(col("event_type") === "purchase")
      .rollup(col("time_of_day"), col("price_bucket"))
      .agg(
        count(lit(1)).as("purchases"),
        moneySumIf(lit(true), col("price")).as("revenue"),
        grouping(col("time_of_day")).as("g_tod"),
        grouping(col("price_bucket")).as("g_bucket"))
      .orderBy(col("g_tod"), col("g_bucket"), col("time_of_day"), col("price_bucket"))
  }

  val rollupSalesSql: String = SilverEvents.oracleCte +
    """
      |SELECT time_of_day, price_bucket,
      |  count(*) AS purchases,
      |  CAST(round(sum(CAST(coalesce(price, 0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
      |  CAST(grouping(time_of_day) AS TINYINT) AS g_tod,
      |  CAST(grouping(price_bucket) AS TINYINT) AS g_bucket
      |FROM silver
      |WHERE event_type = 'purchase'
      |GROUP BY ROLLUP(time_of_day, price_bucket)
      |ORDER BY g_tod, g_bucket, time_of_day, price_bucket""".stripMargin

  /** INTERSECT / EXCEPT surface: buyers who never hit an error, and
    * the overlap of viewer/buyer user sets (SURVEY §2.7 "absent" ops). */
  def buyerSetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val viewersAndBuyers = users("view").intersect(users("purchase"))
      .withColumn("cohort", lit("viewer_and_buyer"))
    val buyersNoError = users("purchase").except(users("error"))
      .withColumn("cohort", lit("buyer_no_error"))
    viewersAndBuyers.union(buyersNoError)
      .select(col("cohort"), col("user_id"))
      .orderBy(col("cohort"), col("user_id"))
  }

  val buyerSetOpsSql: String =
    """SELECT 'viewer_and_buyer' AS cohort, user_id FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
      |  INTERSECT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT 'buyer_no_error' AS cohort, user_id FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |  EXCEPT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
      |ORDER BY cohort, user_id""".stripMargin

  /** Pivot: events per day × event type as columns (`ds.pivot` with a
    * declared domain — declared so the plan needs no extra distinct
    * pass and the output schema is stable). */
  def pivotDailyTypes(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.withColumn("event_date", to_date(col("ts")))
      .groupBy(col("event_date"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("event_date"))
  }

  val pivotDailyTypesSql: String =
    """SELECT CAST(ts AS DATE) AS event_date,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
      |FROM events
      |GROUP BY CAST(ts AS DATE)
      |ORDER BY event_date""".stripMargin

  /** Full rank-window family over per-user purchase sequences:
    * rank/dense_rank on spend, lag/lead navigation, cumulative spend
    * (frames beyond the reference's default-frame-only usage). */
  def purchaseRanks(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val bySpend = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    ev.select(
        col("user_id"), col("event_id"), col("ts"), col("value"),
        date_format(col("ts"), SilverEvents.TsFmt).as("purchase_time"),
        round(col("value"), 2).as("amount"))
      .withColumn("purchase_seq", row_number().over(byUser))
      .withColumn("spend_rank", rank().over(bySpend))
      .withColumn("spend_dense_rank", dense_rank().over(bySpend))
      .withColumn("prev_amount", lag(col("amount"), 1).over(byUser))
      .withColumn("next_amount", lead(col("amount"), 1).over(byUser))
      .withColumn("cumulative_spend",
        round(sum(col("amount").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)), 2).cast("double"))
      .drop("ts", "value")
      .orderBy(col("user_id"), col("purchase_seq"))
  }

  val purchaseRanksSql: String =
    """SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
      |  round(value, 2) AS amount,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS purchase_seq,
      |  CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS spend_rank,
      |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS spend_dense_rank,
      |  lag(round(value, 2), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_amount,
      |  lead(round(value, 2), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_amount,
      |  CAST(round(sum(CAST(round(value, 2) AS DECIMAL(18,2)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE)
      |    AS cumulative_spend
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_seq""".stripMargin

  /** Pure-SQL entry path (the reference's dbt-over-Thrift lane,
    * SURVEY §3 E2): SQL text through spark.sql over registered views —
    * same Catalyst pipeline as the DataFrame API, proven by sharing
    * the oracle with a DuckDB twin of the same text. */
  def sqlWeeklyRevenue(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("graft_events")
    s.sql(
      """SELECT date_format(date_trunc('week', ts), 'yyyy-MM-dd') AS week_start,
        |  event_type,
        |  count(*) AS events,
        |  count(DISTINCT user_id) AS unique_users,
        |  CAST(round(sum(CASE WHEN event_type = 'purchase'
        |                      THEN CAST(value AS DECIMAL(18,2))
        |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS revenue
        |FROM graft_events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)
  }

  val sqlWeeklyRevenueSql: String =
    """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
      |  event_type,
      |  count(*) AS events,
      |  count(DISTINCT user_id) AS unique_users,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(value AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS revenue
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Value-window family (first_value / last_value / nth_value with
    * explicit frames) over per-user purchase sequences — completes the
    * window inventory next to the rank family (purchaseRanks) and the
    * distribution family (itemRevenuePercentiles). */
  def valueWindows(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val fullFrame = byUser.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("purchase_time"),
        round(col("value"), 2).as("amount"))
      .withColumn("first_amount", first(col("amount")).over(byUser))
      .withColumn("last_amount", last(col("amount")).over(fullFrame))
      .withColumn("second_amount", nth_value(col("amount"), 2).over(fullFrame))
      .drop("ts")
      .orderBy(col("user_id"), col("event_id"))
  }

  val valueWindowsSql: String =
    """SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
      |  round(value, 2) AS amount,
      |  first_value(round(value, 2)) OVER w AS first_amount,
      |  last_value(round(value, 2)) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_amount,
      |  nth_value(round(value, 2), 2) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_amount
      |FROM events
      |WHERE event_type = 'purchase'
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Multiset set ops (EXCEPT ALL / INTERSECT ALL — §2.7 completion
    * beyond the distinct-set forms in [[buyerSetOps]]): per-occurrence
    * semantics over the (user_id, event_type) bags of two date halves. */
  def multisetOps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("d"))
    val firstHalf = ev.filter(col("d") <= lit("2024-01-15")).drop("d")
    val secondHalf = ev.filter(col("d") > lit("2024-01-15")).drop("d")
    firstHalf.exceptAll(secondHalf).withColumn("op", lit("first_minus_second"))
      .union(firstHalf.intersectAll(secondHalf).withColumn("op", lit("in_both")))
      .groupBy(col("op"), col("event_type"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("op"), col("event_type"))
  }

  val multisetOpsSql: String =
    """WITH fh AS (SELECT user_id, event_type FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
      |sh AS (SELECT user_id, event_type FROM events WHERE CAST(ts AS DATE) > DATE '2024-01-15'),
      |diffed AS (
      |  SELECT 'first_minus_second' AS op, event_type
      |  FROM (SELECT * FROM fh EXCEPT ALL SELECT * FROM sh)
      |  UNION ALL
      |  SELECT 'in_both', event_type
      |  FROM (SELECT * FROM fh INTERSECT ALL SELECT * FROM sh)
      |)
      |SELECT op, event_type, count(*) AS occurrences
      |FROM diffed
      |GROUP BY op, event_type
      |ORDER BY op, event_type""".stripMargin

  /** JSON extraction (§2.8 "JSON functions: none in reference" — but
    * the props column is JSON, so surface the native path). */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_value"))
      .groupBy(col("k_value"))
      .agg(count(lit(1)).as("event_count"))
      .orderBy(col("k_value"))

  val jsonPropsSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
      |  count(*) AS event_count
      |FROM events
      |GROUP BY 1
      |ORDER BY k_value""".stripMargin

  /** Semi-structured props via Spark 4's VariantType — the native
    * binary-JSON path (`parse_json` → `variant_get`), which at scale
    * beats per-access string re-parsing: the variant decodes once per
    * row into a typed binary that every extraction shares.
    * `try_variant_get` on an absent path must yield NULL (pinned by
    * `n_missing == event_count` in the oracle). */
  def variantProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(parse_json(col("props")).as("v"))
      .select(
        variant_get(col("v"), "$.k", "int").as("k_value"),
        try_variant_get(col("v"), "$.missing", "int").as("missing_value"))
      .groupBy(pmod(col("k_value"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("event_count"),
        graft.ops.ConditionalAgg.countIf(col("missing_value").isNull).as("n_missing"),
        min(col("k_value")).as("min_k"),
        max(col("k_value")).as("max_k"))
      .orderBy(col("k_mod"))

  val variantPropsSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      |  count(*) AS event_count,
      |  count(*) AS n_missing,
      |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events
      |GROUP BY 1
      |ORDER BY k_mod""".stripMargin

  /** Cohort retention matrix — the classic product-analytics query the
    * reference's dashboards stop short of: users cohorted by first
    * purchase month, counted per month offset they remained active.
    * Two grouped aggregates + one join on user_id (the cohort frame is
    * per-user — broadcast at test scale, shuffle join at 100 TB). */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    // weekly grain (epoch-Monday weeks) — the fixture spans ~1 month
    val week = floor(datediff(to_date(col("ts")), lit("1970-01-05")) / 7)
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), week.as("w"))
    val cohorts = purchases.groupBy(col("user_id"))
      .agg(min(col("w")).as("cohort_w"))
    val active = purchases.select(col("user_id"), col("w")).distinct()
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
      .select(
        date_format(date_add(lit("1970-01-05").cast("date"),
          (col("cohort_w") * 7).cast("int")), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("active_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val cohortRetentionSql: String =
    """WITH purchases AS (
      |  SELECT user_id,
      |    date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7 AS w
      |  FROM events WHERE event_type = 'purchase'
      |), cohorts AS (
      |  SELECT user_id, min(w) AS cohort_w FROM purchases GROUP BY user_id
      |), active AS (
      |  SELECT DISTINCT user_id, w FROM purchases
      |)
      |SELECT
      |  strftime(DATE '1970-01-05' + INTERVAL (cohort_w * 7) DAY, '%Y-%m-%d') AS cohort_week,
      |  w - cohort_w AS week_offset,
      |  count(*) AS active_users
      |FROM active JOIN cohorts USING (user_id)
      |GROUP BY cohort_w, w - cohort_w
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Explicit GROUPING SETS through the SQL entry path (the exact set
    * list rollup/cube can't express: per-type, per-day, and grand
    * total — but NOT (type, day)). */
  def groupingSetsSales(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("graft_events")
    s.sql(
      """SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS event_day,
        |  count(*) AS events,
        |  CAST(round(sum(CASE WHEN event_type = 'purchase'
        |                      THEN CAST(value AS DECIMAL(18,2))
        |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS revenue,
        |  grouping(event_type) AS g_type, grouping(date_format(ts, 'yyyy-MM-dd')) AS g_day
        |FROM graft_events
        |GROUP BY GROUPING SETS ((event_type), (date_format(ts, 'yyyy-MM-dd')), ())
        |ORDER BY g_type, g_day, event_type, event_day""".stripMargin)
  }

  val groupingSetsSalesSql: String =
    """SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_day,
      |  count(*) AS events,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(value AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS revenue,
      |  CAST(grouping(event_type) AS TINYINT) AS g_type,
      |  CAST(grouping(strftime(ts, '%Y-%m-%d')) AS TINYINT) AS g_day
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (strftime(ts, '%Y-%m-%d')), ())
      |ORDER BY g_type, g_day, event_type, event_day""".stripMargin

  /** GROUP BY CUBE over (price_bucket, is_weekend) — all four grouping
    * combinations in one expand + hash agg (completes the grouping-set
    * family next to [[rollupSales]]). */
  def cubeSales(s: SparkSession, dir: String): DataFrame = {
    val silver = SilverEvents.build(Tables.events(s, dir))
    silver.filter(col("event_type") === "purchase")
      .cube(col("price_bucket"), col("is_weekend"))
      .agg(
        count(lit(1)).as("purchases"),
        moneySumIf(lit(true), col("price")).as("revenue"),
        grouping(col("price_bucket")).as("g_bucket"),
        grouping(col("is_weekend")).as("g_wknd"))
      .orderBy(col("g_bucket"), col("g_wknd"), col("price_bucket"), col("is_weekend"))
  }

  val cubeSalesSql: String = SilverEvents.oracleCte +
    """
      |SELECT price_bucket, is_weekend,
      |  count(*) AS purchases,
      |  CAST(round(sum(CAST(coalesce(price, 0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
      |  CAST(grouping(price_bucket) AS TINYINT) AS g_bucket,
      |  CAST(grouping(is_weekend) AS TINYINT) AS g_wknd
      |FROM silver
      |WHERE event_type = 'purchase'
      |GROUP BY CUBE(price_bucket, is_weekend)
      |ORDER BY g_bucket, g_wknd, price_bucket, is_weekend""".stripMargin

  /** Distribution-window family (percent_rank / cume_dist) — item
    * revenue ranks WITHIN each price bucket, so every window is
    * partitioned (no global sort). The outputs are exact small-integer
    * ratios, bit-portable without decimal routing. */
  def itemRevenuePercentiles(s: SparkSession, dir: String): DataFrame = {
    val silver = SilverEvents.build(Tables.events(s, dir))
    val perItem = silver
      .filter(col("event_type") === "purchase" && col("item_key").isNotNull)
      .groupBy(col("price_bucket"), col("item_key"))
      .agg(count(lit(1)).as("purchases"),
        moneySumIf(lit(true), col("price")).as("revenue"))
    val w = Window.partitionBy(col("price_bucket"))
      .orderBy(col("revenue").asc, col("item_key").asc)
    perItem
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy(col("price_bucket"), col("item_key"))
  }

  val itemRevenuePercentilesSql: String = SilverEvents.oracleCte +
    """
      |, per_item AS (
      |  SELECT price_bucket, item_key,
      |    count(*) AS purchases,
      |    CAST(round(sum(CAST(coalesce(price, 0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      |  FROM silver
      |  WHERE event_type = 'purchase' AND item_key IS NOT NULL
      |  GROUP BY price_bucket, item_key
      |)
      |SELECT price_bucket, item_key, purchases, revenue,
      |  percent_rank() OVER (PARTITION BY price_bucket ORDER BY revenue ASC, item_key ASC) AS pct_rank,
      |  cume_dist() OVER (PARTITION BY price_bucket ORDER BY revenue ASC, item_key ASC) AS cume
      |FROM per_item
      |ORDER BY price_bucket, item_key""".stripMargin

  /** Event-sequence pattern matching — the MATCH_RECOGNIZE /
    * funnel-with-ordering analog Spark SQL lacks as a native operator:
    * each user's journey is folded to an ordered event-initial string
    * (deterministic (time, event_id) ordering), then a broadcast
    * pattern table counts matching users per regex. Regexes are kept
    * in the Java∩RE2 common dialect so the DuckDB oracle replays them
    * verbatim.
    *
    * Scale: journeys are CAPPED at [[JourneyCap]] events per user —
    * the pre-agg `row_number() <= cap` filter compiles to a map-side
    * `WindowGroupLimit` (plan-pinned in PlanContractSpec), so one bot
    * user with millions of events contributes at most cap rows per
    * mapper before the shuffle and exactly cap rows after it; the agg
    * state per user is then bounded at cap chars. The DuckDB oracle
    * mirrors the cap as `substr(journey, 1, cap)` — identical because
    * each event contributes exactly one character in the same order.
    * After the agg: |users|×|patterns| broadcast rows — the pattern
    * side is constant-sized. */
  val JourneyCap = 512

  def eventPatterns(s: SparkSession, dir: String): DataFrame =
    eventPatternsOver(SilverEvents.build(Tables.events(s, dir)))

  def eventPatternsOver(silver: DataFrame): DataFrame = {
    val s = silver.sparkSession
    import s.implicits._
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("event_time_str"), col("event_id"))
    val limited = silver
      .select(col("user_id"), col("event_time_str"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= JourneyCap)
    val journeys = limited
      .groupBy(col("user_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("__rn").as("r"), col("c")))),
        x => x.getField("c"))).as("journey"))
    val patterns = Seq(
      ("browse_then_buy", "v.*p"),
      ("click_then_buy", "c.*p"),
      ("buyer_without_errors", "^[^e]*p[^e]*$"),
      ("signup_first", "^s")).toDF("pattern", "pattern_regex")
    journeys.crossJoin(broadcast(patterns))
      .groupBy(col("pattern"), col("pattern_regex"))
      .agg(graft.ops.ConditionalAgg.countIf(
        regexp_like(col("journey"), col("pattern_regex"))).as("users_matched"))
      .orderBy(col("pattern"))
  }

  val eventPatternsSql: String = SilverEvents.oracleCte + s"""
    |, journeys AS (
    |  SELECT user_id,
    |    substr(string_agg(substr(event_type, 1, 1), '' ORDER BY event_time_str, event_id), 1, $JourneyCap) AS journey
    |  FROM silver GROUP BY user_id
    |), patterns AS (
    |  SELECT * FROM (VALUES
    |    ('browse_then_buy', 'v.*p'),
    |    ('click_then_buy', 'c.*p'),
    |    ('buyer_without_errors', '^[^e]*p[^e]*$$'),
    |    ('signup_first', '^s')) AS t(pattern, pattern_regex)
    |)
    |SELECT p.pattern, p.pattern_regex,
    |  count(CASE WHEN regexp_matches(j.journey, p.pattern_regex) THEN 1 END) AS users_matched
    |FROM patterns p CROSS JOIN journeys j
    |GROUP BY p.pattern, p.pattern_regex
    |ORDER BY p.pattern""".stripMargin
}
