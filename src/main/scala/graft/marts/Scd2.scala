package graft.marts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Slowly-changing-dimension Type 2 build — the dimension-history
  * operator every dbt/warehouse stack ships (dbt snapshots'
  * `check`/`timestamp` strategy): collapse an event stream into
  * versioned validity intervals per entity, one row per VALUE CHANGE
  * with [valid_from, valid_to) bounds, `is_current` on the open
  * interval, and a per-entity version number.
  *
  * Shape: two windows over the same (user_id; ts, event_id, stage)
  * ordering — lag to detect changes, lead to close intervals — so the
  * whole build is ONE shuffle on the entity key; at 100 TB this is the
  * same per-entity-partition scan any SCD2 materialization needs.
  * Ties: the sort key includes event_id AND stage so duplicate raw
  * events (same ts/id/stage — the bronze reality silver dedups) rank
  * adjacently and the lag filter drops them; both engines sort the
  * identical total order, keeping the query hash-portable. */
object Scd2 {

  def userStageHistory(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        lower(trim(col("event_type"))).as("stage"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc, col("stage").asc)
    val changes = ev
      .withColumn("prev_stage", lag(col("stage"), 1).over(byUser))
      .filter(col("prev_stage").isNull || col("stage") =!= col("prev_stage"))
    val byChange = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc, col("stage").asc)
    changes
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(byChange))
      .select(
        col("user_id"), col("stage"),
        date_format(col("ts"), SilverEvents.TsFmt).as("valid_from"),
        date_format(col("valid_to_ts"), SilverEvents.TsFmt).as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"),
        row_number().over(byChange).cast("int").as("version"))
      .orderBy(col("user_id"), col("version"))
  }

  val userStageHistorySql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, lower(trim(event_type)) AS stage
      |  FROM events WHERE user_id IS NOT NULL
      |), changes AS (
      |  SELECT * FROM (
      |    SELECT user_id, ts, event_id, stage,
      |      lag(stage, 1) OVER (PARTITION BY user_id
      |        ORDER BY ts ASC, event_id ASC, stage ASC) AS prev_stage
      |    FROM ev
      |  ) WHERE prev_stage IS NULL OR stage <> prev_stage
      |), versioned AS (
      |  SELECT user_id, stage, ts,
      |    lead(ts, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC, stage ASC) AS valid_to_ts,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC, stage ASC) AS INT) AS version
      |  FROM changes
      |)
      |SELECT user_id, stage,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
      |  valid_to_ts IS NULL AS is_current,
      |  version
      |FROM versioned
      |ORDER BY user_id, version""".stripMargin
}
