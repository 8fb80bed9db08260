package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match fact rows to [lo, hi) interval rows —
  * point-in-interval, e.g. value→tier lookups or time→window
  * attribution. Spark plans a raw `point >= lo AND point < hi` join
  * as BroadcastNestedLoop (O(n×m) comparisons), which dies when the
  * interval side stops being broadcastable.
  *
  * Scale path ([[bucketed]]): overlay a fixed-width grid; each
  * interval explodes to the grid cells it overlaps, the fact row maps
  * to exactly one cell, and the join becomes an EQUI-join on cell id
  * (hash shuffle, sort-merge-able, AQE-skew-splittable) with the
  * precise range predicate as a residual filter. Cost: intervals
  * duplicated ×(span/bucketWidth), so pick bucketWidth near the
  * median interval span.
  */
object RangeJoin {

  /** Direct formulation — correct at any size, efficient only while
    * the interval side broadcasts. */
  def naive(facts: DataFrame, intervals: DataFrame, point: Column,
            lo: Column, hi: Column, joinType: String = "inner"): DataFrame =
    facts.join(broadcast(intervals), point >= lo && point < hi, joinType)

  /** Grid-bucketed equi-join formulation (the 100 TB path). Interval
    * bounds and the point must be numeric (cast times to epoch first). */
  def bucketed(facts: DataFrame, intervals: DataFrame, pointCol: String,
               loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    val cellOf = (c: Column) => floor(c / bucketWidth).cast("long")
    val iv = intervals
      .withColumn("__cell", explode(sequence(
        cellOf(col(loCol)),
        // hi is exclusive: a hi exactly on a cell boundary doesn't reach that cell
        cellOf(when(col(hiCol) % bucketWidth === 0, col(hiCol) - lit(bucketWidth))
          .otherwise(col(hiCol))))))
    facts
      .withColumn("__cell", cellOf(col(pointCol)))
      .join(iv, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }
}
