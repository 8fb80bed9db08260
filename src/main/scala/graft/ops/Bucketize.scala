package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable CASE-chain bucketing (SURVEY §2.8: price buckets,
  * time-of-day, weekend flags — reference
  * dbt/models/silver/silver_ecommerce_events.sql:46-98,
  * gold_hourly_traffic.sql:16-24).
  *
  * Pure `when` chains: codegen'd, null-total (every input lands in
  * exactly one bucket — property-tested in BucketizeSpec).
  */
object Bucketize {

  /** Half-open upper-bound ranges: value < bound_i → label_i, else
    * `overflowLabel`; NULL → `nullLabel`. */
  def byUpperBounds(c: Column, bounds: Seq[(Double, String)], overflowLabel: String,
                    nullLabel: String): Column = {
    val chain = bounds.foldLeft(when(c.isNull, nullLabel)) {
      case (acc, (bound, label)) => acc.when(c < bound, label)
    }
    chain.otherwise(overflowLabel)
  }

  /** Reference price buckets (FIXTURES §2 domain:
    * UNKNOWN, 0-50, 50-100, 100-200, 200-500, 500+). */
  def priceBucket(price: Column): Column =
    byUpperBounds(price,
      Seq(50.0 -> "0-50", 100.0 -> "50-100", 200.0 -> "100-200", 500.0 -> "200-500"),
      overflowLabel = "500+", nullLabel = "UNKNOWN")

  /** Reference time-of-day buckets over an hour-of-day column
    * (silver_ecommerce_events.sql:88-91). */
  def timeOfDay(hourCol: Column): Column =
    when(hourCol.between(6, 11), "MORNING")
      .when(hourCol.between(12, 17), "AFTERNOON")
      .when(hourCol.between(18, 21), "EVENING")
      .otherwise("NIGHT")

  /** 1=Sunday, 7=Saturday weekend flag (silver_ecommerce_events.sql:95-98;
    * Spark `dayofweek` shares the 1=Sunday convention — SURVEY §7.6 #7). */
  def isWeekend(dayOfWeekNum: Column): Column = dayOfWeekNum.isin(1, 7)
}
