package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k-per-group (generalization of the reference's top-1 brand per
  * category/day: SURVEY §2.5 W2, reference
  * dbt/models/gold/core/gold_category_performance.sql:56-76).
  *
  * Implementation is the rank-window idiom: one shuffle on the group
  * keys, per-partition sort, early filter on row_number — Catalyst
  * inserts a `WindowGroupLimit` (rank-limit pushdown) so each partition
  * keeps only k rows before the final filter; no global sort.
  */
object TopK {
  /** Keep the top `k` rows per group under `order` (must include a
    * tie-breaker for determinism — SURVEY §7.6 #2). */
  def perGroup(df: DataFrame, groupKeys: Seq[String], order: Seq[Column], k: Int,
               rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupKeys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    * per-partition heap, no full sort (SURVEY §2.6 O2). */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
