package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.{KllQuantiles, ThetaSketch}
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
    // materialize the partial table: in production the daily partials
    // ARE a persisted table, and the spine + merge both read THAT
    // (|days| KB rows) — deriving both sides from the raw events
    // would scan the events twice (pinned by PlanContractSpec's
    // one-scan contract)
    val daily = dailyUserSketches(events).localCheckpoint()
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

  // ------------------------------------------------- rolling top-k

  /** SpaceSaving capacity for the product partials: covers the
    * driver corpus's product cardinality (~100) with headroom, so the
    * tested regime is EXACT (count_err = 0 — the full-parity oracle
    * pins it); at production cardinalities ≫ capacity the same query
    * degrades gracefully to the documented SpaceSaving
    * over-estimation bound with O(capacity) state per day. */
  val TopKCapacity = 256

  /** Rolling 7-day top-5 products from per-day SpaceSaving partials —
    * the heavy-hitter face of the partial-table pattern
    * ([[dailyUserSketches]] is the distinct-count face, KLL the
    * quantile face): events fold ONCE into |days| KB-sized BINARY
    * partials, then every trailing window is a spine join + partial
    * merge, never an event rescan. An exact rolling top-k would
    * re-aggregate the full (day × product) frame per window AND keep
    * product-cardinality state; the sketch keeps O(capacity) rows per
    * day regardless of catalog size. */
  def rollingTopProducts(events: DataFrame, k: Int = 5, window: Int = 7): DataFrame = {
    val items = events.select(
      to_date(col("ts")).as("event_date"),
      get_json_object(col("props"), "$.k").as("item"))
      .filter(col("item").isNotNull)
    // materialized partial table (see rollingDistinctUsers): one
    // event scan; spine + merge read the |days|-row partials
    val daily = items.groupBy(col("event_date"))
      .agg(org.apache.spark.sql.graftext.ApproxTopK
        .approxTopKPartial(col("item"), TopKCapacity).as("sk"))
      .localCheckpoint()
    val spine = daily.select(col("event_date").as("d"))
    spine.join(broadcast(daily),
        datediff(col("d"), col("event_date")).between(0, window - 1))
      .groupBy(col("d"))
      .agg(org.apache.spark.sql.graftext.ApproxTopK
        .approxTopKMerge(col("sk"), k, TopKCapacity).as("top"))
      .select(col("d").as("event_date"),
        posexplode(col("top")).as(Seq("pos", "entry")))
      .select(
        col("event_date"),
        (col("pos") + 1).as("rank"),
        col("entry.item").as("item"),
        col("entry.count_est").as("count_est"),
        col("entry.count_err").as("count_err"))
      .orderBy(col("event_date"), col("rank"))
  }

  def rollingTopProductsQuery(s: SparkSession, dir: String): DataFrame =
    rollingTopProducts(Tables.events(s, dir))

  /** Full-parity oracle: in the exact regime (distinct products ≤
    * capacity) the SpaceSaving merge must reproduce the true rolling
    * top-k bit-for-bit — counts exact, count_err 0, ties broken
    * (count desc, item asc) like the sketch's deterministic
    * ordering. */
  val rollingTopProductsSql: String =
    """WITH items AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    json_extract_string(props, '$.k') AS item
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL
      |), days AS (
      |  SELECT DISTINCT d FROM items
      |), win AS (
      |  SELECT days.d AS event_date, i.item, count(*) AS n
      |  FROM days JOIN items i
      |    ON i.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT event_date, item, n,
      |    row_number() OVER (PARTITION BY event_date
      |                       ORDER BY n DESC, item) AS rk
      |  FROM win
      |)
      |SELECT event_date, CAST(rk AS INT) AS rank, item,
      |  n AS count_est, CAST(0 AS BIGINT) AS count_err
      |FROM ranked WHERE rk <= 5
      |ORDER BY event_date, rank""".stripMargin

  // ------------------------------------------------- theta set algebra

  /** Audience-overlap matrix from THETA partials — the set-algebra
    * face HLL cannot serve: for every unordered event-type pair,
    * distinct users doing BOTH (∩), EITHER (∪) and ONLY the first
    * (\), all composed from ONE sketch per type. The event scan
    * happens once (|types| theta partials ≅ KBs); the pair frame is a
    * broadcast nested-loop over a handful of metadata rows — at
    * 100 TB the segment count grows, the event volume doesn't touch
    * this join. lgK=12 ⇒ exact below 4096 users/segment, 1.6 % RSE
    * above; the oracle gate budgets 5 % + 3 per cell. */
  def audienceOverlap(events: DataFrame): DataFrame = {
    // materialized sketch table: both pair endpoints read the
    // |types|-row partials, not the events twice
    val perType = events.filter(col("user_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(ThetaSketch.thetaSketchAgg(col("user_id").cast("string")).as("sk"))
      .localCheckpoint()
    val a = perType.select(col("event_type").as("type_a"), col("sk").as("sk_a"))
    val b = perType.select(col("event_type").as("type_b"), col("sk").as("sk_b"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(
        col("type_a"), col("type_b"),
        round(ThetaSketch.thetaEstimate(
          ThetaSketch.thetaIntersect(col("sk_a"), col("sk_b"))))
          .cast("long").as("users_both"),
        round(ThetaSketch.thetaEstimate(
          ThetaSketch.thetaUnionPair(col("sk_a"), col("sk_b"))))
          .cast("long").as("users_either"),
        round(ThetaSketch.thetaEstimate(
          ThetaSketch.thetaANotB(col("sk_a"), col("sk_b"))))
          .cast("long").as("users_only_a"))
      .orderBy(col("type_a"), col("type_b"))
  }

  def audienceOverlapQuery(s: SparkSession, dir: String): DataFrame =
    audienceOverlap(Tables.events(s, dir))

  /** Oracle-side gate: DuckDB computes the EXACT per-pair overlap /
    * union / difference from events and requires every estimate
    * within 5 % + 3; on success it echoes the verified rows, on
    * failure a sentinel row. */
  val audienceOverlapSql: String =
    """WITH base AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |  WHERE user_id IS NOT NULL
      |), sizes AS (
      |  SELECT event_type, count(*) AS n FROM base GROUP BY 1
      |), bothx AS (
      |  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS n_both
      |  FROM base x JOIN base y
      |    ON x.user_id = y.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2
      |), exact AS (
      |  SELECT sa.event_type AS type_a, sb.event_type AS type_b,
      |    coalesce(b.n_both, 0) AS ex_both,
      |    sa.n + sb.n - coalesce(b.n_both, 0) AS ex_either,
      |    sa.n - coalesce(b.n_both, 0) AS ex_only_a
      |  FROM sizes sa JOIN sizes sb ON sa.event_type < sb.event_type
      |  LEFT JOIN bothx b ON b.ta = sa.event_type AND b.tb = sb.event_type
      |), got AS (
      |  SELECT * FROM read_parquet('{OUT}/q_sketch_audience_overlap/*.parquet')
      |), gates AS (
      |  SELECT
      |    (SELECT count(*) FROM got) = (SELECT count(*) FROM exact)
      |      AND (SELECT count(*) FROM got g LEFT JOIN exact e
      |             ON g.type_a = e.type_a AND g.type_b = e.type_b
      |           WHERE e.type_a IS NULL) = 0 AS rows_ok,
      |    (SELECT count(*) FROM got g JOIN exact e
      |       ON g.type_a = e.type_a AND g.type_b = e.type_b
      |     WHERE abs(g.users_both - e.ex_both) > e.ex_both * 0.05 + 3
      |        OR abs(g.users_either - e.ex_either) > e.ex_either * 0.05 + 3
      |        OR abs(g.users_only_a - e.ex_only_a) > e.ex_only_a * 0.05 + 3) = 0
      |      AS err_ok
      |)
      |SELECT g.* FROM got g WHERE (SELECT rows_ok AND err_ok FROM gates)
      |UNION ALL
      |SELECT 'GATE' AS type_a, 'FAILED' AS type_b,
      |  CAST(-1 AS BIGINT) AS users_both, CAST(-1 AS BIGINT) AS users_either,
      |  CAST(-1 AS BIGINT) AS users_only_a
      |WHERE NOT (SELECT rows_ok AND err_ok FROM gates)""".stripMargin

  // ------------------------------------------------ kll quantile rollup

  /** Rolling 7-day order-value percentiles from KLL partials: orders
    * are scanned ONCE into per-day quantile sketches; p50/p90/p99
    * over every trailing window come from a metadata-sized spine join
    * + partial merge — the quantile analog of the distinct-users
    * rollup above (any additional window size reuses the same
    * persisted partials). */
  def rollingOrderValueQuantiles(orders: DataFrame): DataFrame = {
    // materialized partial table (see rollingDistinctUsers): one
    // orders scan; spine + merge read the |days|-row partials
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("order_date"))
      .agg(KllQuantiles.kllDoublesAgg(col("o_totalprice").cast("double"))
        .as("value_sketch"))
      .localCheckpoint()
    val spine = daily.select(col("order_date").as("d"))
    spine.join(broadcast(daily),
        datediff(col("d"), col("order_date")).between(0, 6))
      .groupBy(col("d").as("order_date"))
      .agg(KllQuantiles.kllMergeAgg(col("value_sketch")).as("sk"))
      .select(
        col("order_date"),
        KllQuantiles.kllQuantile(col("sk"), lit(0.5)).as("p50"),
        KllQuantiles.kllQuantile(col("sk"), lit(0.9)).as("p90"),
        KllQuantiles.kllQuantile(col("sk"), lit(0.99)).as("p99"))
      .orderBy(col("order_date"))
  }

  def rollingOrderValueQuantilesQuery(s: SparkSession, dir: String): DataFrame =
    rollingOrderValueQuantiles(Tables.orders(s, dir))

  /** Oracle-side RANK gate (the right check for a randomized sketch):
    * DuckDB computes, for each estimated percentile q, BOTH exact
    * normalized ranks within the day's trailing-7-day value set —
    * inclusive r(q) = |{v ≤ q}|/n and strict s(q) = |{v < q}|/n — and
    * requires r(q) ≥ target − ε and s(q) ≤ target + ε (ε = 5 %,
    * ≈3× KLL k=200's 1.65 % bound). An exact INCLUSIVE quantile
    * satisfies s(q) < target ≤ r(q), so the two-sided check absorbs
    * small-window discreteness WITHOUT an n-dependent slack. Because
    * KLL retains actual input values (it samples, never interpolates),
    * every estimate must additionally be a MEMBER of its window's
    * value set — that membership check catches fabricated values the
    * rank envelope alone cannot pin at the extremes (a p99 past the
    * window max still has s ≈ 1 ≤ 0.99 + ε; membership goes red even
    * on a 2-row window — negative-tested in
    * tools/gate_negative_check.py). Echo rows on success, sentinel on
    * failure. */
  val rollingOrderValueQuantilesSql: String =
    """WITH vals AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(o_totalprice AS DOUBLE) AS v FROM orders
      |), dates AS (SELECT DISTINCT d FROM vals),
      |win AS (
      |  SELECT a.d, b.v FROM dates a JOIN vals b ON b.d BETWEEN a.d - 6 AND a.d
      |), got AS (
      |  SELECT * FROM read_parquet('{OUT}/q_sketch_rolling_quantiles/*.parquet')
      |), ranks AS (
      |  SELECT g.order_date,
      |    sum(CASE WHEN w.v <= g.p50 THEN 1 ELSE 0 END) * 1.0 / count(*) AS r50,
      |    sum(CASE WHEN w.v <  g.p50 THEN 1 ELSE 0 END) * 1.0 / count(*) AS s50,
      |    sum(CASE WHEN w.v <= g.p90 THEN 1 ELSE 0 END) * 1.0 / count(*) AS r90,
      |    sum(CASE WHEN w.v <  g.p90 THEN 1 ELSE 0 END) * 1.0 / count(*) AS s90,
      |    sum(CASE WHEN w.v <= g.p99 THEN 1 ELSE 0 END) * 1.0 / count(*) AS r99,
      |    sum(CASE WHEN w.v <  g.p99 THEN 1 ELSE 0 END) * 1.0 / count(*) AS s99,
      |    max(CASE WHEN w.v = g.p50 THEN 1 ELSE 0 END) AS m50,
      |    max(CASE WHEN w.v = g.p90 THEN 1 ELSE 0 END) AS m90,
      |    max(CASE WHEN w.v = g.p99 THEN 1 ELSE 0 END) AS m99
      |  FROM got g JOIN win w ON w.d = g.order_date
      |  GROUP BY 1
      |), gates AS (
      |  SELECT
      |    (SELECT count(*) FROM got) = (SELECT count(*) FROM dates)
      |      AND (SELECT count(*) FROM got) = (SELECT count(*) FROM ranks)
      |      AS rows_ok,
      |    (SELECT count(*) FROM ranks
      |     WHERE m50 = 0 OR m90 = 0 OR m99 = 0
      |        OR r50 < 0.45 OR s50 > 0.55
      |        OR r90 < 0.85 OR s90 > 0.95
      |        OR r99 < 0.94) = 0 AS err_ok
      |)
      |SELECT g.* FROM got g WHERE (SELECT rows_ok AND err_ok FROM gates)
      |UNION ALL
      |SELECT CAST('1900-01-01' AS DATE) AS order_date,
      |  CAST(-1 AS DOUBLE) AS p50, CAST(-1 AS DOUBLE) AS p90,
      |  CAST(-1 AS DOUBLE) AS p99
      |WHERE NOT (SELECT rows_ok AND err_ok FROM gates)""".stripMargin

  // ----------------------------------------------- kll drift detection

  /** Per-source length-distribution DRIFT matrix from the same KLL
    * partial family: one documents scan folds each source slice into
    * a quantile sketch, then every source pair gets a two-sample
    * Kolmogorov–Smirnov statistic computed sketch-to-sketch
    * (`kll_ks_delta` — evaluated at the sketches' retained split
    * points, error ≤ summed rank errors ≈ 3.3 % at k=200). This is
    * the corpus-monitoring shape at 100 TB: drift between slices
    * (or between yesterday's and today's partials) is answered from
    * KB-sized persisted state, never by rebuilding a full pairwise
    * CDF over raw values. */
  def sourceLengthDrift(documents: DataFrame): DataFrame = {
    // materialized sketch table: both pair endpoints read the
    // |sources|-row partials, not the documents twice
    val perSource = documents.groupBy(col("source"))
      .agg(
        KllQuantiles.kllDoublesAgg(length(col("text")).cast("double")).as("sk"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    val a = perSource.select(
      col("source").as("source_a"), col("sk").as("sk_a"), col("n").as("n_a"))
    val b = perSource.select(
      col("source").as("source_b"), col("sk").as("sk_b"), col("n").as("n_b"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(
        col("source_a"), col("source_b"),
        KllQuantiles.kllKsDelta(col("sk_a"), col("sk_b")).as("ks_delta"),
        col("n_a"), col("n_b"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def sourceLengthDriftQuery(s: SparkSession, dir: String): DataFrame =
    sourceLengthDrift(Tables.documents(s, dir))

  /** Oracle-side gate: DuckDB builds the EXACT per-source length CDFs
    * (group → window cumsum over the shared value grid), takes the
    * exact pairwise KS sup-distance, and requires every sketch
    * estimate within 0.05 (≳ the 3.3 % two-sketch rank-error budget);
    * per-source doc counts must match exactly. Echo on success,
    * sentinel on failure. */
  val sourceLengthDriftSql: String =
    """WITH vals AS (
      |  SELECT source, CAST(length(text) AS DOUBLE) AS v FROM documents
      |), counts AS (
      |  SELECT source, v, count(*) AS c FROM vals GROUP BY 1, 2
      |), srcs AS (
      |  SELECT source, count(*) AS n FROM vals GROUP BY 1
      |), grid AS (SELECT DISTINCT v FROM vals),
      |dense AS (
      |  SELECT s.source, g.v, coalesce(c.c, 0) AS c
      |  FROM srcs s CROSS JOIN grid g
      |  LEFT JOIN counts c ON c.source = s.source AND c.v = g.v
      |), cdf AS (
      |  SELECT source, v,
      |    sum(c) OVER (PARTITION BY source ORDER BY v) * 1.0 /
      |    sum(c) OVER (PARTITION BY source) AS F
      |  FROM dense
      |), exact AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    max(abs(a.F - b.F)) AS ks
      |  FROM cdf a JOIN cdf b ON a.v = b.v AND a.source < b.source
      |  GROUP BY 1, 2
      |), got AS (
      |  SELECT * FROM read_parquet('{OUT}/text_length_drift/*.parquet')
      |), gates AS (
      |  SELECT
      |    (SELECT count(*) FROM got) = (SELECT count(*) FROM exact)
      |      AND (SELECT count(*) FROM got g LEFT JOIN exact e
      |             ON g.source_a = e.source_a AND g.source_b = e.source_b
      |           WHERE e.source_a IS NULL) = 0 AS rows_ok,
      |    (SELECT count(*) FROM got g JOIN exact e
      |       ON g.source_a = e.source_a AND g.source_b = e.source_b
      |     WHERE abs(g.ks_delta - e.ks) > 0.05) = 0 AS err_ok,
      |    (SELECT count(*) FROM got g
      |       JOIN srcs sa ON sa.source = g.source_a
      |       JOIN srcs sb ON sb.source = g.source_b
      |     WHERE g.n_a <> sa.n OR g.n_b <> sb.n) = 0 AS n_ok
      |)
      |SELECT g.* FROM got g
      |WHERE (SELECT rows_ok AND err_ok AND n_ok FROM gates)
      |UNION ALL
      |SELECT 'GATE' AS source_a, 'FAILED' AS source_b,
      |  CAST(-1 AS DOUBLE) AS ks_delta,
      |  CAST(-1 AS BIGINT) AS n_a, CAST(-1 AS BIGINT) AS n_b
      |WHERE NOT (SELECT rows_ok AND err_ok AND n_ok FROM gates)""".stripMargin

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
