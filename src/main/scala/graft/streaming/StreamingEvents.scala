package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.ops.ConditionalAgg._
import graft.sources.Tables

/** Structured Streaming facade over the events stream (SURVEY §2.9:
  * the reference's "streaming" is incremental batch — watermark
  * filter + in-batch dedup; this is the Spark-native upgrade path:
  * event-time watermark, keyed dedup, windowed aggregation).
  *
  * The transform core ([[hourlyAgg]], [[dedupped]]) is written against
  * plain DataFrames so the SAME code serves batch (oracle-checked via
  * SparkEntry) and streaming (readStream → writeStream, exercised in
  * StreamingSpec with Trigger.AvailableNow — the reference's
  * "process the backlog then stop" batch-incremental semantics).
  *
  * Scale: windowed agg state is bounded by the watermark horizon;
  * dropDuplicates state is keyed by event_id within the watermark —
  * both shuffle on their keys only (no unpartitioned state).
  */
object StreamingEvents {

  /** Events schema for readStream (file streams need it declared). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked keyed dedup — streaming counterpart of ops.Dedup
    * (state expires with the watermark instead of growing forever). */
  def dedupped(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Spark 3.5+ variant with the sharper state contract: state for a
    * key is dropped once the watermark passes the FIRST arrival's
    * event time plus the delay — duplicates are only guaranteed to be
    * suppressed when they arrive within the watermark window of each
    * other (exactly the guarantee a dedup-by-ingest pipeline needs,
    * with strictly smaller state than [[dedupped]]'s keep-forever-
    * until-watermark semantics). */
  def deduppedWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Hour-windowed per-type aggregate. Works identically on batch and
    * streaming inputs; window start/end surfaced as second-precision
    * strings (oracle-portable). `exact=false` swaps the distinct-user
    * count for the HLL sketch — exact distinct aggregation is not
    * executable in streaming mode (and is the 100 TB swap anyway). */
  def hourlyAgg(events: DataFrame, exact: Boolean = true): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("event_count"),
        (if (exact) count_distinct(col("user_id"))
         else approx_count_distinct(col("user_id"))).as("unique_users"),
        moneySumIf(col("event_type") === "purchase", col("value")).as("window_revenue"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"), col("event_count"), col("unique_users"), col("window_revenue"))

  /** Batch entry for the correctness gate: same transform, sorted. */
  def hourlyAggQuery(s: SparkSession, dir: String): DataFrame =
    hourlyAgg(Tables.events(s, dir)).orderBy(col("window_start"), col("event_type"))

  val hourlyAggSql: String =
    """SELECT
      |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
      |  event_type,
      |  count(*) AS event_count,
      |  count(DISTINCT user_id) AS unique_users,
      |  CAST(round(sum(CASE WHEN event_type = 'purchase'
      |                      THEN CAST(coalesce(value, 0) AS DECIMAL(18,2))
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS window_revenue
      |FROM events
      |GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY window_start, event_type""".stripMargin

  /** File-source streaming read (schema must be pre-declared). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Process-backlog-then-stop writer: watermark dedup → windowed agg
    * → sink, with Trigger.AvailableNow — the exact semantics of the
    * reference's incremental batch DAGs, expressed natively. */
  def backlogWriter(stream: DataFrame): DataStreamWriter[Row] =
    hourlyAgg(dedupped(stream), exact = false)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())

  /** Incremental gold serving via foreachBatch: every micro-batch of
    * (deduplicated) events aggregates ONLY its own rows into a
    * MERGEABLE partial — additive counts, full-scale decimal revenue,
    * and datasketches HLL binaries for the distinct-user metrics
    * (plain distinct counts cannot be folded across partials; sketches
    * are the only streaming-correct representation) — and appends it
    * batch-stamped to the serving layout. */
  def incrementalDailySalesWriter(stream: DataFrame, outDir: String): DataStreamWriter[Row] =
    dedupped(stream)
      .writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val silver = graft.marts.SilverEvents.build(batch)
        val isPurchase = col("event_type") === "purchase"
        val partial = silver.groupBy(col("event_date")).agg(
          count(lit(1)).as("total_events"),
          countIf(isPurchase).as("purchase_count"),
          sum(when(isPurchase, coalesce(col("price"), lit(0)))
            .otherwise(lit(0))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("revenue_dec"),
          hll_sketch_agg(col("user_id")).as("users_hll"),
          hll_sketch_agg(when(isPurchase, col("user_id"))).as("buyers_hll"))
        graft.sink.ServingSink.appendSorted(
          partial.withColumn("batch_id", lit(batchId))
            .withColumn("part_month",
              graft.sink.ServingSink.monthOf(col("event_date"))),
          outDir, Seq("part_month"), Seq(col("event_date")))
      }

  /** Offline compaction for [[incrementalDailySalesWriter]] output:
    * fold the batch-stamped partials to one serving row per day —
    * sums re-add, decimal revenue re-sums exactly, HLL sketches union
    * and estimate (the MergeTree background-merge analog). */
  def compactDailySales(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val folded = spark.read.parquet(dir)
      .groupBy(col("event_date"))
      .agg(
        sum(col("total_events")).as("total_events"),
        sum(col("purchase_count")).as("purchase_count"),
        moneySumExact(col("revenue_dec")).as("total_revenue"),
        hll_sketch_estimate(hll_union_agg(col("users_hll"))).as("unique_users"),
        hll_sketch_estimate(hll_union_agg(col("buyers_hll"))).as("unique_buyers"))
    graft.sink.ServingSink.writeDateMart(folded, outDir, "event_date")
    spark.read.parquet(outDir).drop("part_month")
  }

  /** Stream-static enrichment join: the event stream decorated with a
    * static dimension (part catalog keyed by the props-extracted
    * item_key). The static side is broadcast per micro-batch — no
    * streaming state at all, the canonical dimension-enrichment shape
    * (at 100 TB the dim re-broadcasts on change; for slowly-changing
    * dims use the as-of join on a snapshot stream instead). Works
    * identically on a batch frame (oracle/spec equivalence). */
  def enrichedPurchases(events: DataFrame, part: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .withColumn("item_key",
        nullif(regexp_extract(col("props"), "([0-9]+)", 1), lit("")).cast("long"))
      .join(broadcast(part.select(col("p_partkey"), col("p_name"), col("p_brand"))),
        col("item_key") === col("p_partkey"), "left")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        col("item_key"), col("p_name"), col("p_brand"),
        round(col("value"), 2).as("amount"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's signups within the preceding hour. Both sides carry
    * watermarks and the join condition bounds the time range, so
    * state on each side is evictable — the canonical bounded-state
    * stream join shape (state grows with the interval, not the
    * stream). Works identically on batch DataFrames (same plan minus
    * state), which is what the PlatformSpec parity test exploits. */
  def purchaseSignupJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "30 minutes")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("signup_user"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "30 minutes")
    purchases.join(signups,
      col("user_id") === col("signup_user") &&
        col("signup_ts") <= col("purchase_ts") &&
        col("signup_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("user_id"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_time"),
        col("signup_id"),
        date_format(col("signup_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_time"))
  }
}
