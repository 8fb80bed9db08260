package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-processing pattern (SURVEY §2.9 / §2.2 P5): the
  * reference filters new data past `MAX(watermark)` of the target
  * (dbt/models/silver/silver_ecommerce_events.sql:15-18 and the four
  * gold incremental guards).
  *
  * Implemented as a broadcast 1-row cross join rather than a driver
  * `.first()` collect: the watermark aggregate stays distributed, the
  * plan stays lazy, and at 100 TB the scan side still gets min/max
  * rowgroup skipping from the parquet reader after AQE turns the
  * filter into a joined predicate.
  */
object Incremental {

  /** Rows of `source` strictly past `max(watermarkCol of target) + offsetExpr`.
    * `offsetExpr` example: "INTERVAL -7 DAY" (empty for none).
    *
    * Empty/new target ⇒ `max(..)` is NULL ⇒ process EVERYTHING — the
    * dbt `is_incremental()` semantics (first run against a missing
    * target is a full load), not `> NULL` (which would drop all rows). */
  def pastWatermark(source: DataFrame, target: DataFrame, sourceCol: String,
                    targetCol: String, offsetSql: String = ""): DataFrame = {
    val wmExpr = if (offsetSql.isEmpty) col("__graft_wm")
                 else expr(s"__graft_wm $offsetSql")
    val wm = target.agg(max(col(targetCol)).as("__graft_wm"))
    source.crossJoin(broadcast(wm))
      .filter(col("__graft_wm").isNull || col(sourceCol) > wmExpr)
      .drop("__graft_wm")
  }

  /** Append-only incremental write per the reference's dbt `append`
    * strategy (K3): filter past watermark, then append. The reference
    * never merges (SURVEY §2.9) — duplicate late rows are possible and
    * handled downstream by Dedup; `merge=true` fixes that wart with a
    * left-anti on the key (the "correct mode" flag of SURVEY §7.6 #5). */
  def appendNew(source: DataFrame, target: DataFrame, watermarkCol: String,
                keys: Seq[String], merge: Boolean = false): DataFrame = {
    val fresh = pastWatermark(source, target, watermarkCol, watermarkCol)
    if (!merge) fresh
    else fresh.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
  }
}
