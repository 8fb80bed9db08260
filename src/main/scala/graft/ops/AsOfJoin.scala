package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with `rightTime <= leftTime` per key — the standard
  * trades-vs-quotes / event-vs-dimension-state operator that Spark
  * lacks natively.
  *
  * Implementation is the union-sort-window composition (preference (a)
  * of the custom-operator ladder — no custom SparkPlan needed):
  * tag both sides, union, and run `last(right payload, ignoreNulls)`
  * over a per-key window ordered by (time, side) — each left row then
  * carries the most recent right payload at or before its timestamp.
  *
  * Scale: ONE hash shuffle on the key (same shape as a co-partitioned
  * sort-merge join) regardless of how many right rows precede each
  * left row — where the naive "join then filter then rank" approach
  * explodes to |matches| intermediate rows. Ties: rights at the same
  * timestamp sort before lefts (a state change at t applies to events
  * at t); multiple rights on one (key, time) resolve by `rightOrder`.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String],
               rightOrder: Option[Column] = None): DataFrame = {
    val payloadStruct = struct(rightPayload.map(col): _*)

    val taggedRight = right.select(
      col(key).as("__k"), col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      (rightOrder.getOrElse(lit(0L))).as("__ro"),
      payloadStruct.as("__payload"))

    val leftCols = left.columns
    val taggedLeft = left.select(
      Seq(col(key).as("__k"), col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__side"), lit(0L).as("__ro"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.map(col): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // rights first at equal time (__side 0 < 1); latest right wins
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__ro").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+
        col("__asof").as("asof"): _*)
  }

  /** Unpack the matched payload into top-level columns. */
  def backwardFlat(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightPayload: Seq[String]): DataFrame = {
    val joined = backward(left, right, key, leftTime, rightTime, rightPayload)
    rightPayload.foldLeft(joined)((df, c) =>
      df.withColumn(s"asof_$c", col(s"asof.$c"))).drop("asof")
  }
}
