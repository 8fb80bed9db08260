package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-test combinators — the engine-level form of the
  * reference's 21 dbt data tests (SURVEY §5: `unique`, `not_null`,
  * `accepted_values`, `dbt_utils.accepted_range`, freshness;
  * dbt/models/silver/schema.yml:10-60, gold/schema.yml). Each check
  * compiles to a violations count (the dbt "SELECT count(*) FROM
  * (violations)" contract) and the suite aggregates to one small
  * report DataFrame — all lazily, one job per suite run.
  */
object DataChecks {

  final case class Check(name: String, violations: DataFrame)

  /** dbt `unique`: key values appearing more than once. */
  def unique(df: DataFrame, cols: Seq[String]): Check =
    Check(s"unique(${cols.mkString(",")})",
      df.groupBy(cols.map(col): _*).count().filter(col("count") > 1))

  /** dbt `not_null`. */
  def notNull(df: DataFrame, c: String): Check =
    Check(s"not_null($c)", df.filter(col(c).isNull))

  /** dbt `accepted_values`. */
  def acceptedValues(df: DataFrame, c: String, values: Seq[String]): Check =
    Check(s"accepted_values($c)",
      df.filter(col(c).isNotNull && !col(c).isInCollection(values)))

  /** dbt_utils `accepted_range` with optional predicate (the
    * reference's "price >= 0 where not null"). */
  def acceptedRange(df: DataFrame, c: String, min: Option[Double], max: Option[Double]): Check = {
    val conds = Seq(
      min.map(m => col(c) < m),
      max.map(m => col(c) > m)).flatten
    Check(s"accepted_range($c)",
      df.filter(col(c).isNotNull && conds.reduce(_ || _)))
  }

  /** Statistical screen: Benford first-significant-digit test. The
    * violation row appears when the chi-square statistic of the
    * observed digit distribution vs Benford's law exceeds `maxChi2`
    * (guideline: 9 digits ⇒ 8 dof, chi² > ~20 is suspicious at α=0.01;
    * fabricated/defaulted numeric columns fail hard). One aggregate
    * pass + a 9-row broadcast join. */
  def benford(df: DataFrame, c: String, maxChi2: Double = 50.0): Check = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = (1 to 9)
      .map(d => (d.toString, math.log10(1.0 + 1.0 / d))).toDF("d", "p")
    val digits = df
      .filter(col(c).isNotNull && col(c) =!= 0)
      .select(regexp_extract(abs(col(c)).cast("string"), "([1-9])", 1).as("d"))
      .filter(col("d") =!= "")
    val counts = digits.groupBy(col("d")).agg(count(lit(1)).as("n"))
    val stat = expected.join(counts, Seq("d"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(digits.agg(count(lit(1)).as("total"))))
      .select(((col("n") - col("p") * col("total")) * (col("n") - col("p") * col("total"))
        / (col("p") * col("total"))).as("term"))
      .agg(sum(col("term")).as("chi2"))
    Check(s"benford($c)", stat.filter(col("chi2") > maxChi2))
  }

  /** Statistical screen: rows beyond `maxSigma` standard deviations of
    * the column mean (broadcast 1-row stats join, no collect). */
  def outliers(df: DataFrame, c: String, maxSigma: Double = 6.0): Check = {
    val stats = df.agg(avg(col(c)).as("__m"), stddev_samp(col(c)).as("__s"))
    Check(s"outliers($c>${maxSigma}sigma)",
      df.crossJoin(broadcast(stats))
        .filter(col(c).isNotNull && col("__s").isNotNull && col("__s") > 0 &&
          abs(col(c) - col("__m")) > col("__s") * maxSigma))
  }

  /** Source freshness (SURVEY §2.9: warn/error SLA on ingestion time,
    * reference sources.yml:57-59) against an explicit as-of instant. */
  def freshness(df: DataFrame, tsCol: String, maxAgeHours: Int, asOf: Column): Check =
    Check(s"freshness($tsCol<=${maxAgeHours}h)",
      df.agg(max(col(tsCol)).as("newest"))
        .filter(col("newest").isNull ||
          col("newest") < asOf - expr(s"INTERVAL $maxAgeHours HOURS")))

  /** Run a suite: one row per check with its violation count. A single
    * union-of-counts job (each branch is an independent aggregate —
    * Catalyst runs them as one union plan, no driver loop). */
  def report(checks: Seq[Check]): DataFrame =
    checks.map { c =>
      c.violations.agg(count(lit(1)).as("violation_count"))
        .select(lit(c.name).as("check_name"), col("violation_count"),
          (col("violation_count") === 0).as("passed"))
    }.reduce(_ union _)

  /** Check-gated write — the write-path face of the dbt test suite
    * (dbt's `--fail-fast` + Iceberg's write-audit-publish pattern):
    * the frame is STAGED (persisted and materialized) first, the
    * checks run over that staged materialization, and only if every
    * check passes does the write commit — receiving the SAME staged
    * frame the audit saw. A bad batch never reaches the serving
    * layout; it fails loudly with the failing checks named.
    *
    * The staging step is the point (r9 advice, closed r11): auditing
    * the logical plan and then re-executing it for the write audits a
    * RECOMPUTATION — under a nondeterministic source (arrival-order
    * ids, re-listed files, now()-derived columns) the artifact that
    * lands can differ from the one that passed. Persist-materialize
    * pins one result set for both. Returns the audit report as a
    * LOCAL frame (one row per check — it stays valid after the staged
    * frame is unpersisted). */
  def gatedWrite(df: DataFrame, checksFor: DataFrame => Seq[Check])
                (write: DataFrame => Unit): DataFrame = {
    val spark = df.sparkSession
    // localCheckpoint, not persist: a persisted frame whose cached
    // blocks are lost (executor death, eviction) silently RECOMPUTES
    // from the source plan, so under a nondeterministic source the
    // write could still land a result set the checks never audited. A
    // local checkpoint truncates the lineage — lost blocks fail the
    // job loudly instead of recomputing, the honest WAP behavior
    // (the repo's standard pinning idiom; the ContextCleaner reclaims
    // the blocks once the frame is unreferenced).
    val staged = df.localCheckpoint()
    val rep = report(checksFor(staged))
    // one row per check — |checks|-bounded metadata
    val repRows = rep.collect()
    val failing = repRows.filter(!_.getBoolean(2))
    if (failing.nonEmpty)
      throw new IllegalStateException(
        "write aborted, checks failed: " + failing
          .map(r => s"${r.getString(0)} (${r.getLong(1)} violations)")
          .mkString(", "))
    write(staged)
    spark.createDataFrame(
      spark.sparkContext.parallelize(repRows.toIndexedSeq, 1), rep.schema)
  }

  /** The reference's silver-layer test suite over our silver events. */
  def silverSuite(silver: DataFrame): Seq[Check] = Seq(
    unique(silver, Seq("event_unique_id")),
    notNull(silver, "event_unique_id"),
    notNull(silver, "user_id"),
    acceptedValues(silver, "event_type", Seq("view", "click", "purchase", "signup", "error")),
    acceptedValues(silver, "price_bucket",
      Seq("UNKNOWN", "0-50", "50-100", "100-200", "200-500", "500+")),
    acceptedValues(silver, "time_of_day", Seq("MORNING", "AFTERNOON", "EVENING", "NIGHT")),
    acceptedRange(silver, "price", min = Some(0.0), max = None))

  def silverReportQuery(s: SparkSession, dir: String): DataFrame =
    report(silverSuite(graft.marts.SilverEvents.build(graft.sources.Tables.events(s, dir))))
      .orderBy(col("check_name"))

  private def prefixed(mart: String, c: Check): Check =
    c.copy(name = s"$mart.${c.name}")

  /** The reference's GOLD-layer test suite (dbt gold/schema.yml: unique
    * + not_null mart keys, accepted_values on segment/stage domains,
    * non-negative revenue) over our gold marts. */
  def goldSuite(silver: DataFrame,
                dailyStaged: Option[DataFrame] = None): Seq[Check] = {
    import graft.marts._
    // Each mart feeds 2-3 union branches of the report; without a
    // materialization point every branch re-aggregates silver (RFM —
    // the most expensive mart — ran 3× in the round-2 bench).
    // Checkpoint once: the marts are the small side (|dates|, |items|,
    // |users| rows, not |events|), so storing them beats recompute at
    // any scale.
    // eager=false: materialization happens inside the report job's own
    // stages (parallel across marts) instead of four serial driver-
    // blocking jobs; later branches reuse the stored partitions.
    // r19 (guide §1.2): a caller that already materialized the daily
    // mart (SparkEntry's shared staged gold_daily — same build, same
    // checkpoint pinning) passes it in instead of aggregating silver
    // a second time; the audited rows are identical by construction.
    val daily = dailyStaged.getOrElse(DailySales.build(silver).localCheckpoint(false))
    val item = ItemPerformance.build(silver).localCheckpoint(false)
    val journey = UserJourneyFunnel.build(silver).localCheckpoint(false)
    val rfm = RfmSegments.build(silver).localCheckpoint(false)
    Seq(
      prefixed("daily_sales", unique(daily, Seq("event_date"))),
      prefixed("daily_sales", notNull(daily, "event_date")),
      prefixed("daily_sales", acceptedRange(daily, "total_revenue", min = Some(0.0), max = None)),
      prefixed("item_performance", unique(item, Seq("item_key"))),
      prefixed("item_performance", notNull(item, "item_key")),
      prefixed("user_journey_funnel", unique(journey, Seq("user_id"))),
      prefixed("user_journey_funnel", acceptedValues(journey, "current_funnel_stage",
        Seq("PURCHASED", "CLICKED", "VIEWED", "SIGNED_UP", "OTHER"))),
      prefixed("user_rfm_segments", unique(rfm, Seq("user_id"))),
      prefixed("user_rfm_segments", acceptedValues(rfm, "rfm_segment",
        Seq("CHAMPION", "LOYAL", "NEW_CUSTOMER", "AT_RISK", "HIBERNATING", "REGULAR"))),
      prefixed("user_rfm_segments", acceptedRange(rfm, "r_score", min = Some(1.0), max = Some(5.0))))
  }

  def goldReportQuery(s: SparkSession, dir: String): DataFrame =
    report(goldSuite(graft.marts.SilverEvents.build(graft.sources.Tables.events(s, dir))))
      .orderBy(col("check_name"))

  /** DuckDB oracle: each check as its violations-count SQL over the
    * shared silver CTE (the compiled-dbt-test form). */
  val silverReportSql: String = graft.marts.SilverEvents.oracleCte + """
    |SELECT check_name, violation_count, violation_count = 0 AS passed FROM (
    |  SELECT 'unique(event_unique_id)' AS check_name,
    |    (SELECT count(*) FROM (SELECT event_unique_id FROM silver
    |      GROUP BY event_unique_id HAVING count(*) > 1)) AS violation_count
    |  UNION ALL SELECT 'not_null(event_unique_id)',
    |    (SELECT count(*) FROM silver WHERE event_unique_id IS NULL)
    |  UNION ALL SELECT 'not_null(user_id)',
    |    (SELECT count(*) FROM silver WHERE user_id IS NULL)
    |  UNION ALL SELECT 'accepted_values(event_type)',
    |    (SELECT count(*) FROM silver WHERE event_type IS NOT NULL
    |      AND event_type NOT IN ('view','click','purchase','signup','error'))
    |  UNION ALL SELECT 'accepted_values(price_bucket)',
    |    (SELECT count(*) FROM silver WHERE price_bucket IS NOT NULL
    |      AND price_bucket NOT IN ('UNKNOWN','0-50','50-100','100-200','200-500','500+'))
    |  UNION ALL SELECT 'accepted_values(time_of_day)',
    |    (SELECT count(*) FROM silver WHERE time_of_day IS NOT NULL
    |      AND time_of_day NOT IN ('MORNING','AFTERNOON','EVENING','NIGHT'))
    |  UNION ALL SELECT 'accepted_range(price)',
    |    (SELECT count(*) FROM silver WHERE price IS NOT NULL AND price < 0)
    |)
    |ORDER BY check_name""".stripMargin

  /** DuckDB oracle for the gold suite. Key/domain checks reconstruct
    * only the mart columns they inspect; the three RFM checks embed the
    * full RFM oracle as a derived table (its inner `silver` CTE shadows
    * this query's). */
  val goldReportSql: String = {
    val rfm = "(" + graft.marts.RfmSegments.oracleSql + ")"
    graft.marts.SilverEvents.oracleCte + s"""
    |, daily AS (
    |  SELECT event_date,
    |    CAST(round(sum(CASE WHEN event_type = 'purchase'
    |                        THEN CAST(coalesce(price, 0) AS DECIMAL(18,2))
    |                        ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS total_revenue
    |  FROM silver GROUP BY event_date
    |), item AS (
    |  SELECT item_key FROM silver GROUP BY item_key
    |), journey AS (
    |  SELECT user_id,
    |    CASE WHEN max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 THEN 'PURCHASED'
    |         WHEN max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1 THEN 'CLICKED'
    |         WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 THEN 'VIEWED'
    |         WHEN max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) = 1 THEN 'SIGNED_UP'
    |         ELSE 'OTHER' END AS current_funnel_stage
    |  FROM silver GROUP BY user_id
    |)
    |SELECT check_name, violation_count, violation_count = 0 AS passed FROM (
    |  SELECT 'daily_sales.unique(event_date)' AS check_name,
    |    (SELECT count(*) FROM (SELECT event_date FROM daily
    |      GROUP BY event_date HAVING count(*) > 1)) AS violation_count
    |  UNION ALL SELECT 'daily_sales.not_null(event_date)',
    |    (SELECT count(*) FROM daily WHERE event_date IS NULL)
    |  UNION ALL SELECT 'daily_sales.accepted_range(total_revenue)',
    |    (SELECT count(*) FROM daily WHERE total_revenue IS NOT NULL AND total_revenue < 0)
    |  UNION ALL SELECT 'item_performance.unique(item_key)',
    |    (SELECT count(*) FROM (SELECT item_key FROM item
    |      GROUP BY item_key HAVING count(*) > 1))
    |  UNION ALL SELECT 'item_performance.not_null(item_key)',
    |    (SELECT count(*) FROM item WHERE item_key IS NULL)
    |  UNION ALL SELECT 'user_journey_funnel.unique(user_id)',
    |    (SELECT count(*) FROM (SELECT user_id FROM journey
    |      GROUP BY user_id HAVING count(*) > 1))
    |  UNION ALL SELECT 'user_journey_funnel.accepted_values(current_funnel_stage)',
    |    (SELECT count(*) FROM journey WHERE current_funnel_stage IS NOT NULL
    |      AND current_funnel_stage NOT IN ('PURCHASED','CLICKED','VIEWED','SIGNED_UP','OTHER'))
    |  UNION ALL SELECT 'user_rfm_segments.unique(user_id)',
    |    (SELECT count(*) FROM (SELECT user_id FROM $rfm
    |      GROUP BY user_id HAVING count(*) > 1))
    |  UNION ALL SELECT 'user_rfm_segments.accepted_values(rfm_segment)',
    |    (SELECT count(*) FROM $rfm WHERE rfm_segment IS NOT NULL
    |      AND rfm_segment NOT IN ('CHAMPION','LOYAL','NEW_CUSTOMER','AT_RISK','HIBERNATING','REGULAR'))
    |  UNION ALL SELECT 'user_rfm_segments.accepted_range(r_score)',
    |    (SELECT count(*) FROM $rfm WHERE r_score IS NOT NULL
    |      AND (r_score < 1 OR r_score > 5))
    |)
    |ORDER BY check_name""".stripMargin
  }
}
