package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap-fill: densify a sparse per-entity daily series onto
  * a complete date spine, zero-filling additive measures and carrying
  * the last observation forward (LOCF) for stateful ones — the
  * resample/ffill operator every reporting layer reinvents.
  *
  * Scale shape: the spine is |entities| × |days| rows of KEYS ONLY
  * (entities cross-joined against a broadcast 1-row [lo, hi] bounds
  * frame, `sequence` + `explode` — no driver-side date loop), the
  * densify is one left join on (entity, day), and LOCF is a running
  * `last(ignoreNulls)` window partitioned BY ENTITY — state is one
  * value per entity, never a global sort. At 100 TB the spine volume
  * is the product you asked for (a dense daily panel); bound the date
  * range or roll to coarser grain if |entities| × |days| is the
  * problem itself. */
object GapFill {

  /** @param entities  the key universe (one row per entity; its
    *                  columns are the join keys — entities absent
    *                  from `daily` still get a full spine)
    * @param daily     sparse per-(entity, day) aggregates
    * @param dayCol    date column name in `daily`
    * @param bounds    ONE row with `lo`/`hi` DateType columns (from an
    *                  aggregate — broadcast, never `.first()`).
    *                  CONTRACT: rows of `daily` whose day falls outside
    *                  [lo, hi] are EXCLUDED from the output (the spine
    *                  left-join keeps spine days only) — pass bounds
    *                  derived from the data itself (min/max aggregate)
    *                  unless clipping is intended; narrower bounds
    *                  silently drop measure mass
    * @param zeroFills measure → fill value for days with no row
    * @param locfCols  measures to carry forward (null until an
    *                  entity's first observation) */
  def fill(entities: DataFrame, daily: DataFrame, dayCol: String,
           bounds: DataFrame, zeroFills: Map[String, Column],
           locfCols: Seq[String]): DataFrame = {
    val keys = entities.columns.toSeq
    val spine = entities.crossJoin(broadcast(bounds))
      .select(keys.map(col) :+
        explode(sequence(col("lo"), col("hi"))).as(dayCol): _*)
    val joined = spine.join(daily, keys :+ dayCol, "left")
    val zeroed = zeroFills.foldLeft(joined) { case (df, (c, z)) =>
      df.withColumn(c, coalesce(col(c), z)) }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    locfCols.foldLeft(zeroed) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)) }
  }
}
