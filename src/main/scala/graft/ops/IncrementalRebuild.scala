package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.marts.SilverEvents
import graft.sources.Tables

/** Incremental == full-rebuild equivalence harness (SURVEY §2.9).
  *
  * The reference's core streaming claim is that the watermark-guarded
  * incremental silver load converges to the same table a full rebuild
  * produces (dbt/models/silver/silver_ecommerce_events.sql:15-18) —
  * EXCEPT for late data: a row whose event time is at or below the
  * target's high watermark when it finally arrives is silently dropped
  * by the `>` guard (the documented §2.9 wart).
  *
  * This query simulates exactly that delivery pattern over the raw
  * `events` table and emits the resulting diff, row by row:
  *
  *  - delivery 1: everything before [[SplitTs]], minus a 5% "stuck in
  *    the source" slice (`event_id % 20 == 0`);
  *  - delivery 2: everything from [[RedeliverFrom]] on (a 3-day
  *    overlap re-sends rows delivery 1 already loaded — at-least-once
  *    delivery), plus the late 5% slice;
  *  - incremental = silver(delivery 1) ⊎ appendNew(silver(delivery 2))
  *    — [[Incremental.appendNew]]'s watermark guard must drop every
  *    re-sent duplicate (idempotence) and, per the wart, also drops
  *    the genuinely-late rows;
  *  - diff vs the full rebuild: `late_dropped` rows are the wart,
  *    quantified; `spurious` rows must never exist.
  *
  * The whole pipeline is deterministic and SQL-expressible, so the
  * DuckDB oracle replays it verbatim and the driver hash-compares the
  * diff — a regression anywhere in the incremental machinery (guard
  * off-by-one, missed dedup, double-append) changes the diff and turns
  * the row red.
  *
  * Scale shape: the diff's `exceptAll` is a correctness-harness
  * operator (hash shuffle over the compared columns); production runs
  * only the incremental branch, which is a broadcast-watermark filter
  * + per-batch dedup — no full-table reprocessing.
  */
object IncrementalRebuild {

  /** Delivery-1 cutoff (exclusive). */
  val SplitTs = "2024-01-22 00:00:00"
  /** Delivery-2 re-sends everything from here on (3-day overlap). */
  val RedeliverFrom = "2024-01-19 00:00:00"

  private def split(ev: DataFrame): (DataFrame, DataFrame) = {
    val beforeSplit = col("ts") < lit(SplitTs).cast("timestamp")
    val lateSlice = pmod(col("event_id"), lit(20)) === 0
    val b1 = ev.filter(beforeSplit && !lateSlice)
    val b2 = ev.filter(col("ts") >= lit(RedeliverFrom).cast("timestamp") ||
      (beforeSplit && lateSlice))
    (b1, b2)
  }

  /** Incrementally-maintained silver after both deliveries. */
  def incrementalSilver(ev: DataFrame): DataFrame = {
    val (b1, b2) = split(ev)
    // delivery 1 is the existing target table — materialize it once
    // (wm aggregate + union both read it)
    val target = SilverEvents.build(b1).localCheckpoint()
    val fresh = Incremental.appendNew(SilverEvents.build(b2), target,
      "event_time_str", Seq("event_unique_id"))
    target.unionByName(fresh)
  }

  def diffQuery(s: SparkSession, dir: String,
                fullSilver: Option[DataFrame] = None): DataFrame = {
    val ev = Tables.events(s, dir)
    // r19 (guide §1.2): the full-rebuild side IS the shared silver
    // frame — take the caller's cached build instead of re-running
    // the silver transform a third time. The delivery slices (b1/b2)
    // must still build from their filtered deliveries: silver's
    // cross-row dedup does not commute with the delivery filter.
    val full = fullSilver.getOrElse(SilverEvents.build(ev))
    val inc = incrementalSilver(ev)
    def tag(d: DataFrame, kind: String) = d.select(lit(kind).as("diff_kind"),
      col("event_id"), col("event_unique_id"), col("event_time_str"))
    tag(full.exceptAll(inc), "late_dropped")
      .unionByName(tag(inc.exceptAll(full), "spurious"))
      .orderBy(col("diff_kind"), col("event_id"))
  }

  /** DuckDB replay of the full delivery simulation. */
  val diffSql: String = {
    def silverOf(pred: String) = SilverEvents.silverSelectSql(pred)
    s"""WITH b1 AS (${silverOf(
         s" AND ts < TIMESTAMP '$SplitTs' AND event_id % 20 <> 0")}
       |), b2 AS (${silverOf(
         s" AND (ts >= TIMESTAMP '$RedeliverFrom'" +
         s" OR (ts < TIMESTAMP '$SplitTs' AND event_id % 20 = 0))")}
       |), wm AS (SELECT max(event_time_str) AS w FROM b1
       |), fresh AS (
       |  SELECT b2.* FROM b2, wm WHERE wm.w IS NULL OR b2.event_time_str > wm.w
       |), inc AS (
       |  SELECT * FROM b1 UNION ALL SELECT * FROM fresh
       |), fullr AS (${silverOf("")}
       |), missing AS (SELECT * FROM fullr EXCEPT ALL SELECT * FROM inc
       |), extra AS (SELECT * FROM inc EXCEPT ALL SELECT * FROM fullr)
       |SELECT 'late_dropped' AS diff_kind, event_id, event_unique_id, event_time_str FROM missing
       |UNION ALL
       |SELECT 'spurious', event_id, event_unique_id, event_time_str FROM extra
       |ORDER BY diff_kind, event_id""".stripMargin
  }
}
