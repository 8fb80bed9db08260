package graft.marts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.ops.ConditionalAgg.{moneySumExact, roundPortable, roundPortableSql}
import graft.sources.Tables

/** TPC-H-shaped international-trade query forms (engine-completeness
  * coverage, no reference analog — round-3 additions alongside
  * [[TpchHeavyQueries]]):
  *
  *  - Q7 shape: bidirectional nation-pair revenue by year (volume
  *    shipping)
  *  - Q8 shape: national market share inside a region (conditional
  *    share of a grouped sum)
  *  - Q14 shape: promo revenue percentage by month
  *  - Q19 shape: disjunctive OR-of-ANDs join predicate (brand/size/
  *    quantity baskets)
  *
  * Scale notes: every dimension path (supplier→nation, customer→
  * nation→region, part) is pre-filtered BEFORE joining the fact so the
  * selective predicate lands on the small side and the big lineitem⋈
  * orders shuffle moves only surviving rows; dims are broadcast. Money
  * follows the DECIMAL(28,10)→DECIMAL(18,2) per-row conversion rule
  * (Spark rounds shortest-string, DuckDB rounds binary — both agree at
  * 10 digits; see ConditionalAgg.moneySum*).
  */
object TpchTradeQueries {

  /** Per-row revenue as an exact 2-dp decimal. */
  private def rev: Column =
    round((col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(28, 10)), 2).cast(DecimalType(18, 2))

  private val revSql =
    """CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)), 2)
      | AS DECIMAL(18,2))""".stripMargin.replace("\n", "")

  private def suppNation(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))

  // ------------------------------------------------ Q7 shape
  /** Revenue shipped between two nations, both directions, by ship
    * year. The nation filter is applied to each dimension path before
    * the fact joins (only the cross-pair predicate stays post-join). */
  def volumeShipping(s: SparkSession, dir: String,
                     nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val pair = Seq(nationA, nationB)
    val supp = suppNation(s, dir).filter(col("supp_nation").isInCollection(pair))
    val cust = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isInCollection(pair))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("ship_year"), rev.as("r"))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg(moneySumExact(col("r")).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  def volumeShippingQuery(s: SparkSession, dir: String): DataFrame = volumeShipping(s, dir)

  val volumeShippingSql: String =
    s"""SELECT supp_nation, cust_nation, ship_year,
      |  CAST(round(sum(r), 2) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
      |    $revSql AS r
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |) shipping
      |GROUP BY supp_nation, cust_nation, ship_year
      |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin

  // ------------------------------------------------ Q8 shape
  /** Market share of one nation's suppliers within one region's
    * customers for one part type, by ship year: a conditional share of
    * a grouped decimal sum (`sum(CASE national) / sum(all)`). */
  def marketShare(s: SparkSession, dir: String, nation: String = "NATION_5",
                  region: String = "AMERICA", partType: String = "ECONOMY"): DataFrame = {
    val parts = Tables.part(s, dir).filter(col("p_type") === partType).select("p_partkey")
    val custInRegion = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === region)
      .select("c_custkey")
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
        year(col("l_shipdate")).as("ship_year"), rev.as("r"))
    li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custInRegion), col("o_custkey") === col("c_custkey"))
      .groupBy(col("ship_year"))
      .agg(
        moneySumExact(col("r")).as("total_revenue"),
        moneySumExact(coalesce(when(col("supp_nation") === nation, col("r")),
          lit(0).cast(DecimalType(18, 2)))).as("nation_revenue"))
      .withColumn("mkt_share", roundPortable(
        col("nation_revenue") / nullif(col("total_revenue"), lit(0.0)), 6))
      .orderBy(col("ship_year"))
  }

  def marketShareQuery(s: SparkSession, dir: String): DataFrame = marketShare(s, dir)

  val marketShareSql: String =
    s"""WITH shipping AS (
      |  SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
      |    n1.n_name AS supp_nation, $revSql AS r
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
      |), grouped AS (
      |  SELECT ship_year,
      |    CAST(round(sum(r), 2) AS DOUBLE) AS total_revenue,
      |    CAST(round(sum(coalesce(CASE WHEN supp_nation = 'NATION_5' THEN r END,
      |      CAST(0 AS DECIMAL(18,2)))), 2) AS DOUBLE) AS nation_revenue
      |  FROM shipping GROUP BY ship_year
      |)
      |SELECT ship_year, total_revenue, nation_revenue,
      |  ${roundPortableSql("nation_revenue / nullif(total_revenue, 0)", 6)} AS mkt_share
      |FROM grouped
      |ORDER BY ship_year""".stripMargin

  // ------------------------------------------------ Q14 shape
  /** Promo revenue share by ship month: 100 × promo / total over the
    * per-row decimal revenue, one pass, one shuffle on the month key. */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"), rev.as("r"))
    val promoParts = Tables.part(s, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    li.join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("ship_month"))
      .agg(
        moneySumExact(col("r")).as("total_revenue"),
        moneySumExact(coalesce(when(col("is_promo"), col("r")),
          lit(0).cast(DecimalType(18, 2)))).as("promo_revenue"))
      .withColumn("promo_pct", roundPortable(
        lit(100.0) * col("promo_revenue") / nullif(col("total_revenue"), lit(0.0)), 6))
      .orderBy(col("ship_month"))
  }

  val promoRevenueSql: String =
    s"""WITH base AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |    p_type = 'PROMO' AS is_promo, $revSql AS r
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), grouped AS (
      |  SELECT ship_month,
      |    CAST(round(sum(r), 2) AS DOUBLE) AS total_revenue,
      |    CAST(round(sum(coalesce(CASE WHEN is_promo THEN r END,
      |      CAST(0 AS DECIMAL(18,2)))), 2) AS DOUBLE) AS promo_revenue
      |  FROM base GROUP BY ship_month
      |)
      |SELECT ship_month, total_revenue, promo_revenue,
      |  ${roundPortableSql("100.0 * promo_revenue / nullif(total_revenue, 0)", 6)} AS promo_pct
      |FROM grouped
      |ORDER BY ship_month""".stripMargin

  // ------------------------------------------------ Q19 shape
  /** Disjunctive OR-of-ANDs basket predicate spanning both join sides
    * (brand × size × quantity bands). Catalyst extracts the common
    * `p_brand IN (…)` conjunct to prune the broadcast part side early;
    * the residual disjunction evaluates post-join inside codegen. */
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), rev.as("r"))
    val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
    val basket =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey") && basket)
      .agg(
        count(lit(1)).as("line_count"),
        moneySumExact(col("r")).as("revenue"))
  }

  val disjunctiveRevenueSql: String =
    s"""SELECT count(*) AS line_count,
      |  CAST(round(sum(r), 2) AS DOUBLE) AS revenue
      |FROM (SELECT l_partkey, l_quantity, $revSql AS r FROM lineitem) l
      |JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin
}
