package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Mergeable-sketch rollups: distinct-count partials that FOLD — the
  * production pattern for "distinct users over any window" at 100 TB.
  *
  * An exact rolling COUNT(DISTINCT) must rescan every event in the
  * window per output row (28-day window ⇒ each event read 28×, and
  * the distinct state is user-cardinality-sized). The sketch shape
  * scans events ONCE into per-day HLL partials (Datasketches
  * `hll_sketch_agg`, register-wise mergeable, ~16 KB at lgK=14), then
  * answers EVERY window size from the same partials with a
  * metadata-sized self-join: |days| × window rows of KB sketches —
  * independent of event volume. Arrivals extend the pattern for free:
  * a new day's partial is `hll_union_agg`-merged without touching
  * history (the same mergeability contract the streaming
  * `foreachBatch` compaction in StreamingEvents already relies on —
  * this is the batch-query face of that state).
  *
  * Determinism: HLL register merge is max-per-register — associative,
  * commutative, idempotent — so estimates are partitioning-invariant
  * and the driver hash-compare is stable (SketchSpec pins split-merge
  * == direct-sketch EQUALITY, not mere closeness).
  *
  * Correctness is gated ORACLE-SIDE like the ANN family: DuckDB
  * recomputes the exact rolling distincts from the base table and
  * checks every estimate within the lgK=14 error envelope
  * (±1 % ≈ one sigma; the gate allows 5 % + 3 absolute). */
object SketchRollup {

  /** lgConfigK for the user sketches: 2^14 registers ⇒ ~0.8 % RSE,
    * ~16 KB per sketch — tight enough that the 5 % oracle gate sits
    * ≈6 sigma out, small enough that a decade of daily partials is
    * still < 60 MB of broadcastable state. */
  val LgK = 14

  /** Per-day HLL partials of distinct users — the persisted "sketch
    * table". ONE scan + one date-keyed shuffle over events; output is
    * |days| rows regardless of SF. */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events.filter(col("user_id").isNotNull)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(hll_sketch_agg(col("user_id"), lit(LgK)).as("users_sketch"))

  /** Rolling 7-day and 28-day distinct-user estimates, both answered
    * from the SAME daily partials in one pass: a date-spine range
    * self-join over the (broadcast, metadata-sized) sketch table,
    * then one register-merge per (day, window). */
  def rollingDistinctUsers(events: DataFrame): DataFrame = {
    val daily = dailyUserSketches(events)
    val spine = daily.select(col("event_date").as("d"))
    spine.join(broadcast(daily),
        datediff(col("d"), col("event_date")).between(0, 27))
      .withColumn("in_7d", datediff(col("d"), col("event_date")) <= 6)
      .groupBy(col("d").as("event_date"))
      .agg(
        hll_sketch_estimate(
          hll_union_agg(when(col("in_7d"), col("users_sketch")), lit(true)))
          .as("users_7d"),
        hll_sketch_estimate(hll_union_agg(col("users_sketch"), lit(true)))
          .as("users_28d"))
      .orderBy(col("event_date"))
  }

  def rollingDistinctUsersQuery(s: SparkSession, dir: String): DataFrame =
    rollingDistinctUsers(Tables.events(s, dir))

  /** Oracle-side gate: DuckDB reads the Spark estimates back
    * (`{OUT}` substituted at dump time), recomputes the EXACT rolling
    * distincts from events, and requires (1) one output row per
    * active day and (2) every estimate within 5 % + 3 of exact. On
    * success it echoes the verified rows (hash match); on failure a
    * sentinel row no real result can contain. */
  val rollingDistinctUsersSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, user_id
      |  FROM events WHERE user_id IS NOT NULL
      |), dates AS (SELECT DISTINCT d FROM daily),
      |exact AS (
      |  SELECT a.d AS event_date,
      |    count(DISTINCT CASE WHEN b.d >= a.d - 6 THEN b.user_id END) AS ex7,
      |    count(DISTINCT b.user_id) AS ex28
      |  FROM dates a JOIN daily b ON b.d BETWEEN a.d - 27 AND a.d
      |  GROUP BY a.d
      |), got AS (
      |  SELECT * FROM read_parquet('{OUT}/q_sketch_rolling_distinct/*.parquet')
      |), gates AS (
      |  SELECT
      |    (SELECT count(*) FROM got) = (SELECT count(*) FROM exact)
      |      AND (SELECT count(*) FROM got g LEFT JOIN exact e
      |             ON g.event_date = e.event_date WHERE e.event_date IS NULL) = 0
      |      AS rows_ok,
      |    (SELECT count(*) FROM got g JOIN exact e ON g.event_date = e.event_date
      |      WHERE abs(g.users_7d - e.ex7) > e.ex7 * 0.05 + 3
      |         OR abs(g.users_28d - e.ex28) > e.ex28 * 0.05 + 3) = 0 AS err_ok
      |)
      |SELECT g.* FROM got g WHERE (SELECT rows_ok AND err_ok FROM gates)
      |UNION ALL
      |SELECT CAST('1900-01-01' AS DATE) AS event_date,
      |  CAST(-1 AS BIGINT) AS users_7d, CAST(-1 AS BIGINT) AS users_28d
      |WHERE NOT (SELECT rows_ok AND err_ok FROM gates)""".stripMargin
}
