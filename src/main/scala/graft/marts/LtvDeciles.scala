package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.GlobalRank
import graft.sources.Tables

/** Customer lifetime-value deciles — the second consumer of the
  * distributed-exact NTILE ([[GlobalRank.withNtile]]; RFM quintiles
  * are the first): per-customer decimal LTV, globally decile-ranked
  * WITHOUT a single-partition window (range-repartition + local rank +
  * per-partition offsets), hash-verified against DuckDB's ntile(10).
  * The total (ltv, custkey) tie-break order makes the decile
  * assignment unique, so the query is fully oracle-checkable. */
object LtvDeciles {

  def build(s: SparkSession, dir: String): DataFrame = {
    // per-row double→decimal via DECIMAL(28,10) (oracle determinism
    // rule: a direct 2-dp cast rounds Spark's shortest string where
    // DuckDB rounds the binary double — a stored .785 that is really
    // .78499… diverges a cent and shifts a decile boundary)
    val ltv = Tables.orders(s, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice").cast(DecimalType(28, 10)), 2)
          .cast(DecimalType(18, 2)).as("p"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("orders"),
        round(sum(col("p")), 2).cast("double").as("ltv"))
    GlobalRank.withNtile(ltv,
        order = Seq(col("ltv").asc, col("o_custkey").asc), k = 10,
        outCol = "ltv_decile")
      .select(col("o_custkey"), col("orders"), col("ltv"), col("ltv_decile"))
      .orderBy(col("o_custkey"))
  }

  val oracleSql: String =
    """SELECT o_custkey, orders, ltv,
      |  CAST(ntile(10) OVER (ORDER BY ltv ASC, o_custkey ASC) AS INT) AS ltv_decile
      |FROM (
      |  SELECT o_custkey, count(*) AS orders,
      |    CAST(round(sum(CAST(round(CAST(o_totalprice AS DECIMAL(28,10)), 2)
      |      AS DECIMAL(18,2))), 2) AS DOUBLE) AS ltv
      |  FROM orders GROUP BY o_custkey
      |)
      |ORDER BY o_custkey""".stripMargin
}
