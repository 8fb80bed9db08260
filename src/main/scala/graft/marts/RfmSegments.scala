package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.ops.ConditionalAgg._

/** Gold: RFM (recency/frequency/monetary) user segments. Adapted from
  * reference gold_user_rfm_segments.sql:8-99 — per-user purchase
  * aggregates, NTILE(5) quintile scores ×3 (W3), CASE segment chain,
  * and the 1.5× CLV heuristic (§2.8).
  *
  * Determinism (SURVEY §7.6 #2): each NTILE carries a user_id
  * tie-breaker — the reference's bare ORDER BY metric is
  * nondeterministic under ties. CLV is computed in DECIMAL so the
  * ×1.5 half-cent ties round identically to the oracle (half-up ==
  * DuckDB's half-away-from-zero for positive money).
  *
  * Scale: NTILE over an unpartitioned window forces all rows through
  * ONE partition — acceptable because the input is already one row per
  * user with ≥1 purchase. At 100 TB user counts, swap the ntile for
  * the percentile-bucket path: `approxQuantile` cutoffs + a `when`
  * chain — same 1–5 scores, no single-partition sort (SURVEY §7.6 #4).
  */
object RfmSegments {

  def build(silver: DataFrame): DataFrame = {
    val perUser = silver
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        max(col("event_date")).as("last_purchase_date"),
        count(lit(1)).as("frequency"),
        round(sum(coalesce(col("price"), lit(0)).cast(DecimalType(18, 2))), 2).as("monetary_dec"))
      .withColumn("recency_days",
        datediff(to_date(lit(Params.AsOfDate)), col("last_purchase_date")))

    val wr = Window.orderBy(col("recency_days").desc, col("user_id").asc)
    val wf = Window.orderBy(col("frequency").asc, col("user_id").asc)
    val wm = Window.orderBy(col("monetary_dec").asc, col("user_id").asc)

    perUser
      .withColumn("r_score", ntile(5).over(wr))
      .withColumn("f_score", ntile(5).over(wf))
      .withColumn("m_score", ntile(5).over(wm))
      .withColumn("monetary", col("monetary_dec").cast(DoubleType))
      .withColumn("clv_estimate",
        round(col("monetary_dec") * lit(1.5).cast(DecimalType(2, 1)), 2).cast(DoubleType))
      .withColumn("rfm_segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "CHAMPION")
          .when(col("r_score") >= 3 && col("f_score") >= 3, "LOYAL")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "NEW_CUSTOMER")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "AT_RISK")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "HIBERNATING")
          .otherwise("REGULAR"))
      .select("user_id", "last_purchase_date", "recency_days", "frequency",
        "monetary", "r_score", "f_score", "m_score", "rfm_segment", "clv_estimate")
      .orderBy(col("user_id"))
  }

  val oracleSql: String = SilverEvents.oracleCte +
    s"""
      |, per_user AS (
      |  SELECT
      |    user_id,
      |    max(event_date) AS last_purchase_date,
      |    count(*) AS frequency,
      |    round(sum(CAST(coalesce(price, 0) AS DECIMAL(18,2))), 2) AS monetary_dec
      |  FROM silver
      |  WHERE event_type = 'purchase'
      |  GROUP BY user_id
      |), scored AS (
      |  SELECT *,
      |    CAST(date_diff('day', last_purchase_date, DATE '${Params.AsOfDate}') AS INT) AS recency_days,
      |    ntile(5) OVER (ORDER BY date_diff('day', last_purchase_date, DATE '${Params.AsOfDate}') DESC, user_id ASC) AS r_score,
      |    ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f_score,
      |    ntile(5) OVER (ORDER BY monetary_dec ASC, user_id ASC) AS m_score
      |  FROM per_user
      |)
      |SELECT
      |  user_id, last_purchase_date, recency_days, frequency,
      |  CAST(monetary_dec AS DOUBLE) AS monetary,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'CHAMPION'
      |       WHEN r_score >= 3 AND f_score >= 3 THEN 'LOYAL'
      |       WHEN r_score >= 4 AND f_score <= 2 THEN 'NEW_CUSTOMER'
      |       WHEN r_score <= 2 AND f_score >= 3 THEN 'AT_RISK'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'HIBERNATING'
      |       ELSE 'REGULAR' END AS rfm_segment,
      |  CAST(round(monetary_dec * CAST(1.5 AS DECIMAL(2,1)), 2) AS DOUBLE) AS clv_estimate
      |FROM scored
      |ORDER BY user_id""".stripMargin
}
