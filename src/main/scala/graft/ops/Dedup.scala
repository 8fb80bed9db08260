package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication operators.
  *
  * `latestPerKey` reproduces the reference's silver dedup (SURVEY §2.5
  * W1; reference dbt/models/silver/silver_ecommerce_events.sql:111-123:
  * ROW_NUMBER() OVER (PARTITION BY event_unique_id ORDER BY
  * _bronze_ingestion_time DESC) … WHERE row_num = 1).
  *
  * Scale notes (100 TB):
  *  - The window partitions by the dedup key, so it is a single hash
  *    shuffle on the key — identical shuffle shape to groupBy; AQE
  *    handles skewed keys.
  *  - Callers MUST pass a total order (tie-breaker) in `order`; the
  *    reference's bare `ORDER BY ts DESC` is nondeterministic under
  *    ties (SURVEY §7.6 #2) and would flap the oracle hash.
  *  - `exact` (all-column or key-only duplicate removal) maps to
  *    Spark's `dropDuplicates`, which plans as a hash aggregate —
  *    cheaper than a window when row identity (not recency) decides.
  */
object Dedup {

  /** Keep the first row per key under `order` (deterministic top-1). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Exact duplicate removal on a key set (arbitrary survivor). */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)
}
