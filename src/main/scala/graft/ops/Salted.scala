package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the manual fallback when AQE's
  * skew-join splitting doesn't apply — e.g. skewed AGGREGATION keys,
  * which AQE does not rebalance).
  *
  * Two-phase aggregate: spray each hot key across `saltBuckets`
  * sub-keys (deterministic spread via a hash of the whole row's
  * monotonically varying component is NOT used — the salt only needs
  * uniformity, so a per-row random-ish hash of a distinguishing
  * column works), partially aggregate on (key, salt), then finish on
  * key. Both phases are map-side-combinable hash aggregates; the
  * first shuffle carries |keys|×buckets rows instead of one giant
  * partition for the hot key.
  *
  * Only algebraic aggregates (sum/count/min/max) compose across the
  * two phases — the API takes the partial and final expressions
  * explicitly so misuse is visible at the call site.
  */
object Salted {

  /** Two-phase salted aggregation.
    * @param saltSource a column with per-row variation (e.g. an id)
    *                   used to derive the salt deterministically. */
  def aggregate(df: DataFrame, keys: Seq[String], saltSource: Column, saltBuckets: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted count+sum convenience: the common skewed-rollup shape. */
  def countSum(df: DataFrame, keys: Seq[String], saltSource: Column, valueCol: Column,
               saltBuckets: Int = 16): DataFrame =
    aggregate(df, keys, saltSource, saltBuckets,
      partialAggs = Seq(count(lit(1)).as("__cnt"), sum(valueCol).as("__sum")),
      finalAggs = Seq(sum(col("__cnt")).as("row_count"), sum(col("__sum")).as("value_sum")))
}
