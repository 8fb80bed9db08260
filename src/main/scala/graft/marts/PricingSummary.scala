package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.ConditionalAgg._

/** TPC-H-Q1-shaped pricing summary over `lineitem` — exercises the
  * reference's hash-aggregate family (SURVEY §2.4 A1/A5/A8/A9) on the
  * high-cardinality TPC-H side of the testdata (FIXTURES §4).
  *
  * Scale: groupBy on 2 low-cardinality keys → partial aggregation does
  * nearly all the work map-side; shuffle carries ~|groups|×partitions
  * rows. Money in DECIMAL for order-independence (SURVEY §7.6 #3).
  */
object PricingSummary {

  def build(lineitem: DataFrame): DataFrame = {
    // Discount math in exact DECIMAL: double multiply + 2-dp rounding
    // would hit .xx5 ties where Spark (HALF_UP on the binary value) and
    // the DuckDB oracle disagree; 2dp×2dp decimals are exact at 4dp.
    val discPrice = col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(3, 0)) - col("l_discount").cast(DecimalType(4, 2)))
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySumExact(discPrice).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", ratio(col("sum_qty"), col("count_order")))
      .withColumn("avg_price", ratio(col("sum_base_price"), col("count_order")))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val oracleSql: String =
    """SELECT
      |  l_returnflag,
      |  l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                 * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order,
      |  CAST(round(CAST(CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
      |        / nullif(CAST(count(*) AS DOUBLE), 0) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_qty,
      |  CAST(round(CAST(CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |        / nullif(CAST(count(*) AS DOUBLE), 0) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_price
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
