package graft.marts

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.ConditionalAgg
import graft.sources.Tables

/** Statistical moments (corr / covar / stddev / regression slope) in
  * the determinism-safe factorization: Spark's builtin `corr`/`stddev`
  * stream double co-moments whose value depends on partition order —
  * unusable for a hash-compared result at 100 TB. Instead the five
  * raw power sums Σx, Σy, Σx², Σy², Σxy accumulate as EXACT decimals
  * (per-row cast to DECIMAL(18,2), products at DECIMAL(37,4) — order
  * independent), and each statistic is derived from them in ONE
  * double-precision expression per group, identical in the oracle.
  *
  * Shape at scale: a single map-side-combining hash aggregate over
  * (returnflag) — the same cost as any grouped sum; no second pass,
  * no window. */
object StatsMoments {

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  def moments(lineitem: DataFrame): DataFrame = {
    val agg = lineitem.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(d2(col("l_quantity"))).as("sx"),
        sum(d2(col("l_extendedprice"))).as("sy"),
        sum(d2(col("l_quantity")) * d2(col("l_quantity"))).as("sxx"),
        sum(d2(col("l_extendedprice")) * d2(col("l_extendedprice"))).as("syy"),
        sum(d2(col("l_quantity")) * d2(col("l_extendedprice"))).as("sxy"))
    val n = col("n_rows").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val covN = n * sxy - sx * sy
    agg.select(
        col("l_returnflag"),
        col("n_rows"),
        ConditionalAgg.roundPortable(
          covN / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr_qty_price"),
        ConditionalAgg.roundPortable(covN / (n * n), 4).as("covar_pop_qty_price"),
        ConditionalAgg.roundPortable(sqrt(n * sxx - sx * sx) / n, 6).as("stddev_pop_qty"),
        ConditionalAgg.roundPortable(covN / (n * sxx - sx * sx), 6).as("regr_slope_price_on_qty"))
      .orderBy(col("l_returnflag"))
  }

  def momentsQuery(s: SparkSession, dir: String): DataFrame =
    moments(Tables.lineitem(s, dir))

  val momentsSql: String = {
    import ConditionalAgg.roundPortableSql
    s"""WITH sums AS (
       |  SELECT l_returnflag,
       |    count(*) AS n_rows,
       |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
       |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
       |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
       |  FROM lineitem GROUP BY l_returnflag
       |), d AS (
       |  SELECT l_returnflag, n_rows,
       |    CAST(n_rows AS DOUBLE) AS n,
       |    CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
       |    CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
       |    CAST(sxy AS DOUBLE) AS sxy
       |  FROM sums
       |)
       |SELECT l_returnflag, n_rows,
       |  ${roundPortableSql(
            "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))", 6)} AS corr_qty_price,
       |  ${roundPortableSql("(n * sxy - sx * sy) / (n * n)", 4)} AS covar_pop_qty_price,
       |  ${roundPortableSql("sqrt(n * sxx - sx * sx) / n", 6)} AS stddev_pop_qty,
       |  ${roundPortableSql("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS regr_slope_price_on_qty
       |FROM d
       |ORDER BY l_returnflag""".stripMargin
  }
}
