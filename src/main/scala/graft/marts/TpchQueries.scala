package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.{ConditionalAgg, Incremental, TopK}
import ConditionalAgg._
import graft.sources.Tables

/** Join / set / top-k / watermark coverage on the TPC-H-ish star
  * schema (FIXTURES §4: these tables supply the high-cardinality join
  * coverage the reference's single join (SURVEY §2.3 J1) doesn't).
  *
  * Scale notes per query are inline; the common themes: dimension
  * tables are `broadcast()` (no shuffle for the fact side), money is
  * exact DECIMAL, every ORDER BY carries a total tie-break.
  */
object TpchQueries {

  /** Exact-decimal discounted revenue (see PricingSummary — per-row
    * double rounding would diverge from the oracle). */
  private def discRevenue = col("l_extendedprice").cast(DecimalType(18, 2)) *
    (lit(1).cast(DecimalType(3, 0)) - col("l_discount").cast(DecimalType(4, 2)))

  private val discRevenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  /** Fact ⋈ 4 broadcast dims, revenue rollup by region/nation.
    * Plan shape: lineitem scans once; orders is the only shuffle join
    * (both sides large); customer/nation/region broadcast — at 1000
    * executors the dims ship once per executor, not per task. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        moneySumExact(discRevenue).as("revenue"),
        count(lit(1)).as("line_count"),
        count_distinct(col("o_custkey")).as("unique_customers"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val revenueByNationSql: String =
    s"""SELECT
       |  r_name, n_name,
       |  CAST(round(sum($discRevenueSql), 2) AS DOUBLE) AS revenue,
       |  count(*) AS line_count,
       |  count(DISTINCT o_custkey) AS unique_customers
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** Global top-5 parts by revenue — ORDER BY + LIMIT plans as
    * TakeOrderedAndProject (per-partition heaps, no global sort;
    * SURVEY §2.6 O2). */
  def topParts(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    val perPart = li.groupBy(col("l_partkey"))
      .agg(moneySumExact(discRevenue).as("part_revenue"),
           count(lit(1)).as("order_lines"))
    TopK.global(
      perPart.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
                col("part_revenue"), col("order_lines")),
      order = Seq(col("part_revenue").desc, col("p_partkey").asc), k = 5)
  }

  val topPartsSql: String =
    s"""SELECT p_partkey, p_name, p_brand,
       |  CAST(round(sum($discRevenueSql), 2) AS DOUBLE) AS part_revenue,
       |  count(*) AS order_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_partkey, p_name, p_brand
       |ORDER BY part_revenue DESC, p_partkey ASC
       |LIMIT 5""".stripMargin

  /** UNION ALL row-count dashboard across tables (SURVEY §2.7 U1,
    * reference dags/05_clickhouse_complete_setup.py:301-354). */
  def unionCounts(s: SparkSession, dir: String): DataFrame = {
    val tbls = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tbls.map { t =>
        Tables.load(s, dir, t).agg(count(lit(1)).as("row_count"))
          .select(lit(t).as("table_name"), col("row_count"))
      }.reduce(_ union _)
      .orderBy(col("table_name"))
  }

  val unionCountsSql: String =
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => s"SELECT '$t' AS table_name, count(*) AS row_count FROM $t")
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")

  /** Incremental watermark filter (SURVEY §2.2 P5): lineitem shipped in
    * the 7 days before the newest shipment, via the distributed
    * broadcast-scalar pattern in [[graft.ops.Incremental]]. */
  def recentShipments(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    Incremental.pastWatermark(li, li, "l_shipdate", "l_shipdate", "- INTERVAL 7 DAY")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("recent_lines"),
           moneySumExact(discRevenue).as("recent_revenue"))
      .orderBy(col("l_returnflag"))
  }

  val recentShipmentsSql: String =
    s"""SELECT l_returnflag,
       |  count(*) AS recent_lines,
       |  CAST(round(sum($discRevenueSql), 2) AS DOUBLE) AS recent_revenue
       |FROM lineitem
       |WHERE l_shipdate > (SELECT max(l_shipdate) - INTERVAL 7 DAY FROM lineitem)
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  /** GROUP BY + HAVING (SURVEY §2.2 P8 / §2.4 A13). */
  def frequentBuyers(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_count"),
           moneySum(col("o_totalprice")).as("lifetime_value"))
      .filter(col("order_count") >= 15)
      .orderBy(col("o_custkey"))

  val frequentBuyersSql: String =
    """SELECT o_custkey,
      |  count(*) AS order_count,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS lifetime_value
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 15
      |ORDER BY o_custkey""".stripMargin

  /** Left-anti join (beyond-reference semi/anti surface): customers
    * with no high-value order. Anti side aggregates small → broadcast. */
  def customersWithoutBigOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
    c.join(broadcast(big), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val customersWithoutBigOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** Pct-of-total (SURVEY §2.5 W4, reference
    * bronze_ingestion.py:230-238): order share by priority. The SQL
    * form is `sum(..) OVER ()`; here the global total is a broadcast
    * 1-row cross join instead — identical values, but no
    * unpartitioned WindowExec in the plan (OVER () funnels its whole
    * input through one partition and warns on every run; the
    * broadcast-total shape is what you'd write at 100 TB, where the
    * pre-aggregated frame may not be tiny). */
  def orderPriorityShare(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
    val total = agg.agg(sum(col("order_count")).as("__total"))
    agg.crossJoin(broadcast(total))
      .withColumn("pct_of_total",
        ConditionalAgg.roundPortable(lit(100.0) * col("order_count") / col("__total"), 2))
      .drop("__total")
      .orderBy(col("o_orderpriority"))
  }

  val orderPriorityShareSql: String =
    """SELECT o_orderpriority, order_count,
      |  CAST(round(CAST(100.0 * CAST(order_count AS DOUBLE) / CAST(sum(order_count) OVER () AS DOUBLE)
      |    AS DECIMAL(28,10)), 2) AS DOUBLE) AS pct_of_total
      |FROM (SELECT o_orderpriority, count(*) AS order_count
      |      FROM orders GROUP BY o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin

  /** As-of join (beyond-reference operator, SURVEY custom-op ladder
    * (a)): each purchase matched to the user's latest signup at or
    * before it. Cross-checked against DuckDB's NATIVE ASOF JOIN — our
    * union-window composition must agree with a first-class
    * implementation. */
  def purchasesWithLastSignup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("purchase_time"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("last_signup_time"))
    graft.ops.AsOfJoin.backwardFlat(purchases, signups, "user_id", "ts", "ts",
        Seq("last_signup_time"))
      .select(col("event_id"), col("user_id"), col("purchase_time"),
        col("asof_last_signup_time").as("last_signup_time"))
      .orderBy(col("event_id"))
  }

  /** The same as-of query through the NATIVE whole-operator path
    * (custom-op ladder (c): AsOfJoinPlan → AsOfJoinStrategy →
    * AsOfJoinExec, a co-partitioned streaming merge) — same oracle as
    * the composed version, so the custom SparkPlan is hash-verified
    * against DuckDB's native ASOF JOIN. */
  def purchasesWithLastSignupNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("purchase_time"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("last_signup_time"))
    org.apache.spark.sql.graftext.AsOfJoinNative
      .backwardFlat(purchases, signups, "user_id", "ts", "ts",
        Seq("last_signup_time"))
      .select(col("event_id"), col("user_id"), col("purchase_time"),
        col("asof_last_signup_time").as("last_signup_time"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of through the native exec: each purchase matched to
    * the user's NEXT error at or after it (time-to-failure style
    * lookup); DuckDB's ASOF JOIN with the `<=` inequality is the
    * oracle. Keyed on (user_id) with error times unique per user in
    * the fixture (ties would resolve arbitrarily — documented). */
  def purchasesWithNextError(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("purchase_time"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("next_error_time"))
    org.apache.spark.sql.graftext.AsOfJoinNative
      .forwardFlat(purchases, errors, "user_id", "ts", "ts",
        Seq("next_error_time"))
      .select(col("event_id"), col("user_id"), col("purchase_time"),
        col("asof_next_error_time").as("next_error_time"))
      .orderBy(col("event_id"))
  }

  val purchasesWithNextErrorSql: String =
    """SELECT e.event_id, e.user_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
      |  strftime(x.ts, '%Y-%m-%d %H:%M:%S') AS next_error_time
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
      |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') x
      |  ON e.user_id = x.user_id AND e.ts <= x.ts
      |ORDER BY e.event_id""".stripMargin

  /** Nearest-direction as-of (merge_asof direction='nearest' parity)
    * through the native exec: each purchase matched to the CLOSER of
    * the user's previous/next signup, ties preferring backward. The
    * oracle composes DuckDB's two directional ASOF joins and re-applies
    * the same µs-distance pick. */
  def purchasesWithNearestSignup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("purchase_time"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        date_format(col("ts"), SilverEvents.TsFmt).as("nearest_signup_time"))
    org.apache.spark.sql.graftext.AsOfJoinNative
      .nearestFlat(purchases, signups, "user_id", "ts", "ts",
        Seq("nearest_signup_time"))
      .select(col("event_id"), col("user_id"), col("purchase_time"),
        col("asof_nearest_signup_time").as("nearest_signup_time"))
      .orderBy(col("event_id"))
  }

  val purchasesWithNearestSignupSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
      |b AS (SELECT p.event_id, p.user_id, p.ts, s.ts AS bt
      |      FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts),
      |f AS (SELECT p.event_id, s2.ts AS ft
      |      FROM p ASOF LEFT JOIN s s2 ON p.user_id = s2.user_id AND p.ts <= s2.ts)
      |SELECT b.event_id, b.user_id,
      |  strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
      |  strftime(CASE
      |    WHEN ft IS NULL THEN bt
      |    WHEN bt IS NULL THEN ft
      |    WHEN (epoch_us(b.ts) - epoch_us(bt)) <= (epoch_us(ft) - epoch_us(b.ts)) THEN bt
      |    ELSE ft END, '%Y-%m-%d %H:%M:%S') AS nearest_signup_time
      |FROM b JOIN f USING (event_id)
      |ORDER BY event_id""".stripMargin

  val purchasesWithLastSignupSql: String =
    """SELECT e.event_id, e.user_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
      |  strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS last_signup_time
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
      |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.event_id""".stripMargin

  /** Gap-based sessionization over raw events (beyond-reference
    * window surface: lag + conditional cumulative sum). A new session
    * starts after a >30 min silence per user.
    *
    * Scale: both windows partition by user_id — one shuffle total;
    * no unpartitioned window anywhere. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("prev_sec", lag(col("ts").cast("long"), 1).over(byUser))
      .withColumn("is_new_session",
        when(col("prev_sec").isNull || (col("ts").cast("long") - col("prev_sec")) > 1800, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("session_events"),
        date_format(min(col("ts")), SilverEvents.TsFmt).as("session_start"),
        date_format(max(col("ts")), SilverEvents.TsFmt).as("session_end"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_seconds"),
        moneySumIf(col("event_type") === "purchase", col("value")).as("session_revenue"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  val sessionizeSql: String =
    """WITH seq AS (
      |  SELECT *,
      |    sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM (
      |    SELECT *,
      |      CASE WHEN lag(epoch(date_trunc('second', ts))) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |             OR epoch(date_trunc('second', ts))
      |                - lag(epoch(date_trunc('second', ts))) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
      |           THEN 1 ELSE 0 END AS is_new_session
      |    FROM events)
      |)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  count(*) AS session_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |  CAST(max(epoch(date_trunc('second', ts))) - min(epoch(date_trunc('second', ts))) AS BIGINT) AS duration_seconds,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(value, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS session_revenue
      |FROM seq
      |GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** The NATIVE session-window operator (`session_window(ts, gap)` —
    * Spark's merging-interval session aggregation, the streaming-ready
    * form of [[sessionize]]): session end = last event + gap, events
    * exactly `gap` apart start a NEW session (interval overlap is
    * strict). Oracle reconstructs the same semantics at full µs
    * precision with a lag + cumulative-sum pass. */
  def sessionWindows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("session_events"),
        moneySumIf(col("event_type") === "purchase", col("value")).as("session_revenue"))
      .select(col("user_id"),
        date_format(col("session_window.start"), SilverEvents.TsFmt).as("session_start"),
        date_format(col("session_window.end"), SilverEvents.TsFmt).as("session_end"),
        col("session_events"), col("session_revenue"))
      .orderBy(col("user_id"), col("session_start"))

  val sessionWindowsSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_type, value,
      |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |), seq AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked
      |)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  count(*) AS session_events,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(value, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS session_revenue
      |FROM seq
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin
}
