package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.marts.{DailySales, SilverEvents}
import graft.sources.Tables

/** MERGE INTO (SCD1 upsert) as a relational operator — the "correct
  * mode" the reference's append-only dbt strategy lacks (SURVEY §2.9;
  * `Incremental.appendNew(merge = true)` covers insert-only dedup,
  * this covers WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
  * INSERT *). Without a transactional table format the merge is the
  * engine-level shape Delta/Iceberg compile MERGE into anyway: a
  * full-outer join on the keys with whole-row source-wins semantics,
  * producing the rewritten table.
  *
  * Scale: ONE shuffle join on the merge keys; with the target bucketed
  * on those keys ([[graft.sink.BucketedTables]]) the target-side
  * exchange is elided — the classic copy-on-write MERGE cost model.
  */
object MergeUpsert {

  /** Whole-row upsert: where a source row matches on `keys` its values
    * replace the target row (source NULLs win — UPDATE SET *); source
    * rows with no match are inserted; unmatched target rows pass
    * through. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.sameElements(source.columns),
      s"merge requires aligned schemas: ${target.columns.toSeq} vs ${source.columns.toSeq}")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    val s = source
      .select(source.columns.toSeq.map(c =>
        if (keys.contains(c)) col(c) else col(c).as(s"__s_$c")): _*)
      .withColumn("__matched", lit(true))
    target.join(s, keys, "full_outer")
      .select(keys.map(col) ++ dataCols.map(c =>
        when(coalesce(col("__matched"), lit(false)), col(s"__s_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** Window restatement — the canonical production MERGE use: the
    * serving mart was built from an incomplete load (the held-back 5%
    * slice of [[IncrementalRebuild]]), and the last 7 days are
    * recomputed from complete data and merged in. Days inside the
    * restatement window come out corrected (updates + inserts); older
    * days keep their stale values — exactly what the oracle asserts,
    * row by row. */
  def restatedDailySales(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val beforeSplit = col("ts") < lit(IncrementalRebuild.SplitTs).cast("timestamp")
    val lateSlice = pmod(col("event_id"), lit(20)) === 0
    val target = DailySales.build(SilverEvents.build(ev.filter(beforeSplit && !lateSlice)))
    val source = DailySales.build(SilverEvents.build(ev))
      .filter(col("event_date") >= lit(RestateFrom).cast("date"))
    upsert(target, source, Seq("event_date")).orderBy(col("event_date"))
  }

  /** Restatement window start (7 days before the incremental split). */
  val RestateFrom = "2024-01-15"

  val restatedDailySalesSql: String = {
    val b1 = SilverEvents.silverSelectSql(
      s" AND ts < TIMESTAMP '${IncrementalRebuild.SplitTs}' AND event_id % 20 <> 0")
    val full = SilverEvents.silverSelectSql("")
    s"""WITH b1 AS ($b1
       |), fullr AS ($full
       |), t_daily AS (${DailySales.aggSqlOver("b1")}
       |), s_daily AS (
       |  SELECT * FROM (${DailySales.aggSqlOver("fullr")})
       |  WHERE event_date >= DATE '$RestateFrom'
       |)
       |SELECT * FROM s_daily
       |UNION ALL
       |SELECT * FROM t_daily WHERE event_date < DATE '$RestateFrom'
       |ORDER BY event_date""".stripMargin
  }
}
