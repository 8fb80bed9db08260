package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.ConditionalAgg.{roundPortable, roundPortableSql}
import graft.sources.Tables

/** TPC-H-shaped heavy query forms the round-1 library lacked
  * (engine-completeness coverage, no reference analog):
  *
  *  - Q2 shape: correlated MIN subquery (min-cost supplier per part)
  *  - Q21 shape: EXISTS + NOT-EXISTS anti-join chain (sole late
  *    supplier in multi-supplier orders)
  *  - Q18 shape: IN over a grouped-HAVING subquery (large-quantity
  *    orders)
  *
  * Adapted to the driver testdata (TESTDATA.md): no partsupp table —
  * the part↔supplier cost relation is derived from lineitem unit
  * prices; no receipt/commit dates — "late" is a >90-day ship lag
  * from the order date.
  */
object TpchHeavyQueries {

  // ------------------------------------------------ Q2 shape
  /** Min-cost supplier per part (p_size = 15 slice): the correlated
    * `cost = (SELECT min(cost) … WHERE partkey = outer.partkey)`
    * decorrelated the Spark way — a per-part window MIN co-partitioned
    * with the cost relation (one shuffle on l_partkey), dimensions
    * broadcast. */
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val costs = Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val wPart = Window.partitionBy(col("l_partkey"))
    val minCost = costs
      .withColumn("min_cost", min(col("unit_cost")).over(wPart))
      .filter(col("unit_cost") === col("min_cost"))
    minCost
      .join(broadcast(Tables.part(s, dir).filter(col("p_size") === 15)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name").as("supplier_nation"),
        roundPortable(col("unit_cost"), 4).as("best_unit_cost"))
      .orderBy(col("best_unit_cost").asc, col("p_partkey").asc, col("s_name").asc)
      .limit(100)
  }

  val minCostSupplierSql: String =
    s"""WITH costs AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem WHERE l_quantity > 0
      |  GROUP BY l_partkey, l_suppkey
      |)
      |SELECT p_partkey, p_name, s_name, n_name AS supplier_nation,
      |  ${roundPortableSql("c.unit_cost", 4)} AS best_unit_cost
      |FROM costs c
      |JOIN part ON c.l_partkey = p_partkey AND p_size = 15
      |JOIN supplier ON c.l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE c.unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
      |                     WHERE c2.l_partkey = c.l_partkey)
      |ORDER BY best_unit_cost ASC, p_partkey ASC, s_name ASC
      |LIMIT 100""".stripMargin

  // ------------------------------------------------ Q21 shape
  /** Suppliers that were the SOLE late shipper of a multi-supplier
    * order (late = shipped >90 days after the order date). The
    * EXISTS branch is a left-semi join, the NOT-EXISTS an anti join —
    * both on l_orderkey with the ≠-supplier predicate attached, so
    * each is one co-partitioned shuffle; supplier is broadcast. */
  def soleLateSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val late = li
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("l_orderkey", "l_suppkey")
    val l1 = late.as("l1")
    // EXISTS: some other supplier shipped a line of the same order
    val withOther = l1.join(li.select("l_orderkey", "l_suppkey").as("l2"),
      col("l1.l_orderkey") === col("l2.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l2.l_suppkey"), "left_semi")
    // NOT EXISTS: no other supplier was ALSO late on that order
    val sole = withOther.join(late.as("l3"),
      col("l1.l_orderkey") === col("l3.l_orderkey") &&
        col("l1.l_suppkey") =!= col("l3.l_suppkey"), "left_anti")
    sole
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  val soleLateSupplierSql: String =
    """WITH late AS (
      |  SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |)
      |SELECT s_name, count(*) AS numwait
      |FROM late l1
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC
      |LIMIT 20""".stripMargin

  // ------------------------------------------------ Q18 shape
  /** Large-quantity orders: customers whose orders exceed 250 total
    * units — `o_orderkey IN (grouped HAVING)` planned as a left-semi
    * against the re-aggregated lineitem (quantities are integral
    * doubles, so the sums are exact and portable). */
  def largeQuantityOrders(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  val largeQuantityOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  o_totalprice, total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum(l_quantity) > 250) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  // ------------------------------------------------ Q22 shape
  /** Idle wealthy customers: above-average account balance and no
    * URGENT orders — the global-avg scalar subquery (broadcast 1-row
    * cross join, same pattern as the incremental watermark) plus a
    * left-anti join standing in for NOT EXISTS. */
  def idleWealthyCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("__avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("__avg_bal"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        roundPortable(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val idleWealthyCustomersSql: String =
    s"""SELECT c_mktsegment, count(*) AS numcust,
      |  ${roundPortableSql("sum(c_acctbal)", 2)} AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------ Q11 shape
  /** Major suppliers: those whose revenue exceeds a fixed fraction of
    * TOTAL revenue — HAVING against a global scalar subquery
    * (broadcast the 1-row total; per-supplier aggregate shuffles once
    * on l_suppkey). Revenue in DECIMAL so group and total sums are
    * order-independent. */
  def majorSuppliers(s: SparkSession, dir: String, fraction: Double = 0.0012): DataFrame = {
    // per-row double→decimal goes through DECIMAL(28,10): a direct 2dp
    // cast rounds Spark's shortest-string repr where DuckDB rounds the
    // binary double — at 10 digits both agree, then the 2dp round and
    // the decimal sum are exact on both sides
    import org.apache.spark.sql.types.DecimalType
    val li = Tables.lineitem(s, dir)
      .select(col("l_suppkey"),
        round((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(28, 10)), 2).cast(DecimalType(18, 2)).as("rev"))
    val perSupp = li.groupBy(col("l_suppkey")).agg(sum(col("rev")).as("supp_rev"))
    val total = li.agg(sum(col("rev")).as("total_rev"))
    perSupp.crossJoin(broadcast(total))
      .filter(col("supp_rev") > col("total_rev") * lit(fraction))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("supp_rev").cast("double").as("supplier_revenue"))
      .orderBy(col("supplier_revenue").desc, col("s_suppkey").asc)
  }

  val majorSuppliersSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)), 2)
      |      AS DECIMAL(18,2)) AS r
      |  FROM lineitem
      |)
      |SELECT s_suppkey, s_name,
      |  CAST(sum(r) AS DOUBLE) AS supplier_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_suppkey, s_name
      |HAVING sum(r) > (SELECT sum(r) FROM rev) * 0.0012
      |ORDER BY supplier_revenue DESC, s_suppkey ASC""".stripMargin

  // ------------------------------------------------ exact percentiles
  /** Exact interpolated percentiles of order value per priority:
    * Spark's `percentile` and DuckDB's `quantile_cont` share the
    * (1−d)·lower + d·upper definition, so the doubles agree bit-for-
    * bit. Exact percentile sorts each group's values — at 100 TB
    * switch to `percentile_approx` (mergeable sketch) like the
    * approx-distinct swap. */
  def orderValuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("orders"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .orderBy(col("o_orderpriority"))

  val orderValuePercentilesSql: String =
    """SELECT o_orderpriority,
      |  count(*) AS orders,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  quantile_cont(o_totalprice, 0.99) AS p99
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** The 100 TB percentile swap, error-gated (the §7.4 approx-rewrite
    * pattern, percentile edition): `percentile_approx` replaces the
    * exact per-group value sort with a mergeable single-pass summary,
    * exactly as the HLL sketch replaces distinct-count. The raw
    * sketch output is not partitioning-portable (partial merge order
    * shifts estimates within their bound), so — like
    * `gold_daily_sales_approx` — only this GATE row carries the
    * oracle. The gate checks the sketch's OWN contract, in RANK
    * space: Greenwald–Khanna guarantees the returned value's rank is
    * within `n/gateAccuracy` of `p·n` — a value-space envelope would
    * be wrong for small groups, where adjacent order statistics gap
    * wider than any fixed relative bound. Per priority: the exact
    * order count and how many of the three approx percentiles sit
    * outside their rank window. DuckDB recomputes the counts exactly
    * and pins zero violations; a sketch regression turns the row red.
    * `gateAccuracy` defaults to the sketch accuracy; the spec's
    * negative control gates a deliberately coarse sketch against a
    * tight window to prove the gate fires. */
  def orderValuePercentilesApproxGate(s: SparkSession, dir: String,
                                      accuracy: Int = 10000,
                                      gateAccuracy: Int = 0): DataFrame = {
    val eps = 1.0 / (if (gateAccuracy > 0) gateAccuracy else accuracy)
    val ps = Seq(0.5, 0.9, 0.99)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))
    val approxLong = orders.groupBy(col("o_orderpriority"))
      .agg(expr(s"percentile_approx(o_totalprice, array(${ps.mkString("D, ")}D), $accuracy)")
        .as("ap"))
      .select(col("o_orderpriority"), posexplode(col("ap")).as(Seq("pi", "a")))
      .withColumn("p", element_at(typedLit(ps), col("pi") + 1))
    val ranks = orders.join(broadcast(approxLong), "o_orderpriority")
      .groupBy(col("o_orderpriority"), col("p"), col("a"))
      .agg(count(lit(1)).as("n"),
        graft.ops.ConditionalAgg.countIf(col("o_totalprice") < col("a")).as("below"),
        graft.ops.ConditionalAgg.countIf(col("o_totalprice") <= col("a")).as("at_or_below"))
    // the value's rank span [below+1, at_or_below] must intersect the
    // window p·n ± eps·n (one rank of slack for the interpolation gap)
    val viol = when(
      col("at_or_below") + 1 < col("n") * (col("p") - lit(eps)) ||
        col("below") > col("n") * (col("p") + lit(eps)), 1).otherwise(0)
    ranks.groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("orders"),
        sum(viol).cast("long").as("n_out_of_bound"))
      .orderBy(col("o_orderpriority"))
  }

  val orderValuePercentilesApproxGateSql: String =
    """SELECT o_orderpriority, count(*) AS orders,
      |  CAST(0 AS BIGINT) AS n_out_of_bound
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
}
