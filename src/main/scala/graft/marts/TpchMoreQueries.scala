package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.ConditionalAgg._
import graft.ops.{GapFill, RangeJoin, TopK}
import graft.sources.Tables

/** Additional TPC-H-shaped workloads widening the join/filter
  * surface: shipping-priority (Q3-like), returned-items customer
  * ranking (Q10-like), and a grid-bucketed range join (value→tier). */
object TpchMoreQueries {

  private def discRevenue = col("l_extendedprice").cast(DecimalType(18, 2)) *
    (lit(1).cast(DecimalType(3, 0)) - col("l_discount").cast(DecimalType(4, 2)))

  private val discRevenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  /** Q3-like shipping priority: top-10 open orders by pending revenue
    * for one market segment. Fact⋈fact shuffle join + broadcast
    * customer filter + date predicates pushed to both scans. */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-01"
    val buildCust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val openOrders = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
    val lateLines = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
    val joined = lateLines
      .join(openOrders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(buildCust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_orderpriority"))
      .agg(moneySumExact(discRevenue).as("revenue"))
    TopK.global(joined, Seq(col("revenue").desc, col("l_orderkey").asc), 10)
  }

  val shippingPrioritySql: String =
    s"""SELECT l_orderkey,
       |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       |  o_orderpriority,
       |  CAST(round(sum($discRevenueSql), 2) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-01'
       |  AND l_shipdate > TIMESTAMP '1998-06-01'
       |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
       |ORDER BY revenue DESC, l_orderkey ASC
       |LIMIT 10""".stripMargin

  /** Q10-like: customers ranked by revenue lost to returned items
    * (returnflag = 'R'), with nation context. */
  def returnedItems(s: SparkSession, dir: String): DataFrame = {
    val returns = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val joined = returns
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(moneySumExact(discRevenue).as("lost_revenue"),
           count(lit(1)).as("returned_lines"))
    TopK.global(joined, Seq(col("lost_revenue").desc, col("c_custkey").asc), 20)
  }

  val returnedItemsSql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  CAST(round(sum($discRevenueSql), 2) AS DOUBLE) AS lost_revenue,
       |  count(*) AS returned_lines
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY lost_revenue DESC, c_custkey ASC
       |LIMIT 20""".stripMargin

  /** Q13-like customer distribution: LEFT OUTER join preserving
    * order-less customers, then a count-of-counts histogram — two
    * chained aggregations over one join. */
  def customerDistribution(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_count"))  // count skips NULLs → 0 for orderless
    perCust.groupBy(col("order_count"))
      .agg(count(lit(1)).as("customer_count"))
      .orderBy(col("customer_count").desc, col("order_count").desc)
  }

  val customerDistributionSql: String =
    """SELECT order_count, count(*) AS customer_count
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS order_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY order_count
      |ORDER BY customer_count DESC, order_count DESC""".stripMargin

  /** Trailing-7-day revenue per day — a RANGE frame over a numeric
    * date ordinal (the only frame family the reference never uses;
    * SURVEY §2.5 "no explicit frame specs"). RANGE (not ROWS) so gaps
    * in the date spine are handled correctly.
    *
    * The window is partitioned by YEAR with a 6-day boundary pad:
    * a -6..0 day frame for any row only ever needs rows from its own
    * year plus the final 6 days of the previous one, so those pad rows
    * are duplicated into the next year's partition (and dropped after
    * the window). Identical output to the global OVER (ORDER BY …),
    * but the plan never funnels all days through one partition — the
    * per-partition frame is bounded at ~371 rows regardless of how
    * many years the corpus spans. */
  def trailingRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("sale_date"))
      .agg(moneySum(col("value")).as("day_revenue"))
      .withColumn("day_ord", datediff(col("sale_date"), lit("1970-01-01").cast("date")))
    val base = daily
      .withColumn("part_year", year(col("sale_date")))
      .withColumn("is_pad", lit(false))
    val pad = daily
      .filter(year(date_add(col("sale_date"), 6)) > year(col("sale_date")))
      .withColumn("part_year", year(col("sale_date")) + 1)
      .withColumn("is_pad", lit(true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("part_year")).orderBy(col("day_ord")).rangeBetween(-6, 0)
    base.unionByName(pad)
      .withColumn("trailing_7d_revenue",
        round(sum(col("day_revenue").cast(DecimalType(18, 2))).over(w), 2).cast("double"))
      .filter(!col("is_pad"))
      .select(date_format(col("sale_date"), "yyyy-MM-dd").as("sale_date"),
        col("day_revenue"), col("trailing_7d_revenue"))
      .orderBy(col("sale_date"))
  }

  val trailingRevenueSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS sale_date,
      |    CAST(round(sum(CAST(coalesce(value, 0) AS DECIMAL(18,2))), 2) AS DOUBLE) AS day_revenue,
      |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_ord
      |  FROM events
      |  WHERE event_type = 'purchase'
      |  GROUP BY CAST(ts AS DATE)
      |)
      |SELECT strftime(sale_date, '%Y-%m-%d') AS sale_date, day_revenue,
      |  CAST(round(sum(CAST(day_revenue AS DECIMAL(18,2)))
      |    OVER (ORDER BY day_ord RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
      |    AS trailing_7d_revenue
      |FROM daily
      |ORDER BY sale_date""".stripMargin

  /** Correlated scalar subqueries (Catalyst's
    * RewriteCorrelatedScalarSubquery path): customers' orders above
    * their own per-customer total/count threshold. The comparison is
    * cross-multiplied (`price × count > sum`) so it stays in exact
    * DECIMAL — a correlated AVG of doubles would tie-break
    * differently across engines. */
  def aboveAvgOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT o_custkey, count(*) AS above_avg_orders
        |FROM graft_orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2))
        |      * (SELECT count(*) FROM graft_orders i WHERE i.o_custkey = o.o_custkey)
        |    > (SELECT sum(CAST(i.o_totalprice AS DECIMAL(18,2)))
        |       FROM graft_orders i WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin)
  }

  val aboveAvgOrdersSql: String =
    """SELECT o_custkey, count(*) AS above_avg_orders
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,2))
      |      * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      |    > (SELECT sum(CAST(i.o_totalprice AS DECIMAL(18,2)))
      |       FROM orders i WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** EXISTS predicate subquery (RewritePredicateSubquery → semi join). */
  def urgentCustomers(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
    Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
    s.sql(
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM graft_customer
        |WHERE EXISTS (SELECT 1 FROM graft_orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  val urgentCustomersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Price-tier range join over orders via the grid-bucketed
    * formulation (ops.RangeJoin): tier table is tiny here, but the
    * plan shape is the equi-join one that survives unbroadcastable
    * interval sides. */
  def orderPriceTiers(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val tiers = Seq(
      ("ECONOMY", 0.0, 100000.0),
      ("STANDARD", 100000.0, 250000.0),
      ("PREMIUM", 250000.0, 400000.0),
      ("LUXURY", 400000.0, 1000000.0)).toDF("tier", "lo", "hi")
    RangeJoin.bucketed(Tables.orders(s, dir), tiers, "o_totalprice", "lo", "hi",
        bucketWidth = 50000.0)
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("order_count"),
           moneySum(col("o_totalprice")).as("tier_revenue"))
      .orderBy(col("tier"))
  }

  val orderPriceTiersSql: String =
    """WITH tiers(tier, lo, hi) AS (VALUES
      |  ('ECONOMY', 0.0, 100000.0),
      |  ('STANDARD', 100000.0, 250000.0),
      |  ('PREMIUM', 250000.0, 400000.0),
      |  ('LUXURY', 400000.0, 1000000.0))
      |SELECT tier,
      |  count(*) AS order_count,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS tier_revenue
      |FROM orders JOIN tiers
      |  ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY tier
      |ORDER BY tier""".stripMargin

  /** Gap-filled daily revenue panel per nation ([[graft.ops.GapFill]]):
    * the sparse (nation, order-day) aggregate densified onto the full
    * global date spine — revenue zero-filled (additive), the average
    * order value carried forward (LOCF, null before a nation's first
    * order). Nations come from the DIM table, so a nation with no
    * orders at all still gets its spine. Decimal-path money and the
    * portable ratio keep every value repartition-invariant. */
  def gapfillNationRevenue(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val daily = o
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
      .agg(moneySum(col("o_totalprice")).as("day_revenue"),
        ratio(sum(col("o_totalprice").cast(DecimalType(18, 2))),
          count(lit(1)), 6).as("day_avg"))
    val bounds = o.agg(to_date(min(col("o_orderdate"))).as("lo"),
      to_date(max(col("o_orderdate"))).as("hi"))
    GapFill.fill(Tables.nation(s, dir).select("n_name"), daily, "day", bounds,
        zeroFills = Map("day_revenue" -> lit(0.0)),
        locfCols = Seq("day_avg"))
      .select(col("n_name"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("day_revenue"),
        col("day_avg").as("last_known_avg"))
      .orderBy(col("n_name"), col("day"))
  }

  val gapfillNationRevenueSql: String = {
    val avgExpr = roundPortableSql(
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)", 6)
    s"""WITH b AS (
       |  SELECT CAST(min(o_orderdate) AS DATE) AS lo,
       |         CAST(max(o_orderdate) AS DATE) AS hi FROM orders
       |), d AS (
       |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM b
       |), daily AS (
       |  SELECT n_name, CAST(o_orderdate AS DATE) AS day,
       |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS day_revenue,
       |    $avgExpr AS day_avg
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation   ON c_nationkey = n_nationkey
       |  GROUP BY n_name, CAST(o_orderdate AS DATE)
       |)
       |SELECT n.n_name, strftime(d.day, '%Y-%m-%d') AS day,
       |  coalesce(daily.day_revenue, 0.0) AS day_revenue,
       |  last_value(daily.day_avg IGNORE NULLS) OVER (
       |    PARTITION BY n.n_name ORDER BY d.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_known_avg
       |FROM nation n CROSS JOIN d
       |LEFT JOIN daily ON daily.n_name = n.n_name AND daily.day = d.day
       |ORDER BY n.n_name, day""".stripMargin
  }
}
