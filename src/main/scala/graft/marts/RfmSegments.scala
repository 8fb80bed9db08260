package graft.marts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.ops.ConditionalAgg._
import graft.ops.GlobalRank

/** Gold: RFM (recency/frequency/monetary) user segments. Adapted from
  * reference gold_user_rfm_segments.sql:8-99 — per-user purchase
  * aggregates, NTILE(5) quintile scores ×3 (W3), CASE segment chain,
  * and the 1.5× CLV heuristic (§2.8).
  *
  * Determinism (SURVEY §7.6 #2): each NTILE carries a user_id
  * tie-breaker — the reference's bare ORDER BY metric is
  * nondeterministic under ties. CLV is computed in DECIMAL so the
  * ×1.5 half-cent ties round identically to the oracle (half-up ==
  * DuckDB's half-away-from-zero for positive money).
  *
  * Scale: the reference's `NTILE(5) OVER (ORDER BY …)` would force the
  * |users|-sized frame through ONE partition ×3 sorts. The scores here
  * are the SAME exact ntile quintiles computed distributed via
  * [[GlobalRank.withNtile]] (range-repartition + per-partition offset
  * ranks) — no single-partition window anywhere in the plan, identical
  * output, same DuckDB oracle. [[buildAtScale]] is the one-pass
  * approximate alternative (quantile-cutoff scoring) for when three
  * range shuffles are too many.
  */
object RfmSegments {

  private[marts] def perUser(silver: DataFrame): DataFrame = silver
    .filter(col("event_type") === "purchase")
    .groupBy(col("user_id"))
    .agg(
      max(col("event_date")).as("last_purchase_date"),
      count(lit(1)).as("frequency"),
      round(sum(coalesce(col("price"), lit(0)).cast(DecimalType(18, 2))), 2).as("monetary_dec"))
    .withColumn("recency_days",
      datediff(to_date(lit(Params.AsOfDate)), col("last_purchase_date")))

  /** Segment CASE chain + CLV + serving projection, shared by both
    * scoring paths (expects r_score/f_score/m_score present). */
  private def deriveSegments(scored: DataFrame): DataFrame =
    scored
      .withColumn("monetary", col("monetary_dec").cast(DoubleType))
      .withColumn("clv_estimate",
        round(col("monetary_dec") * lit(1.5).cast(DecimalType(2, 1)), 2).cast(DoubleType))
      .withColumn("rfm_segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "CHAMPION")
          .when(col("r_score") >= 3 && col("f_score") >= 3, "LOYAL")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "NEW_CUSTOMER")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "AT_RISK")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "HIBERNATING")
          .otherwise("REGULAR"))
      .select("user_id", "last_purchase_date", "recency_days", "frequency",
        "monetary", "r_score", "f_score", "m_score", "rfm_segment", "clv_estimate")
      .orderBy(col("user_id"))

  def build(silver: DataFrame): DataFrame = {
    // localCheckpoint: the three rankings each run a small counting job
    // plus the final pass — truncating lineage here means they all read
    // the materialized per-user frame instead of re-aggregating silver
    // (per-user rows are tiny relative to events; executor-local storage)
    val base = perUser(silver).localCheckpoint()
    val r = GlobalRank.withNtile(base,
      Seq(col("recency_days").desc, col("user_id").asc), 5, "r_score")
    val f = GlobalRank.withNtile(r,
      Seq(col("frequency").asc, col("user_id").asc), 5, "f_score")
    val m = GlobalRank.withNtile(f,
      Seq(col("monetary_dec").asc, col("user_id").asc), 5, "m_score")
    deriveSegments(m)
  }

  /** One-pass approximate scoring: quantile cutoffs (Greenwald–Khanna
    * sketch, `relErr` rank error; 0 = exact) + a comparison chain.
    * Trades the exact path's three range shuffles for a single stats
    * pass — the shape to prefer when the per-user frame itself is
    * huge. Scores can differ from [[build]] only for users whose
    * metric ties a quintile boundary (ntile splits ties by user_id;
    * cutoff scoring keeps tied values together). */
  def buildAtScale(silver: DataFrame, relErr: Double = 0.0): DataFrame = {
    val base = perUser(silver)
      .withColumn("monetary_dbl", col("monetary_dec").cast(DoubleType))
    val probs = Array(0.2, 0.4, 0.6, 0.8)
    // one job computes all three sketches (columns share the pass);
    // empty input yields empty sketches — degrade to all-1 scores
    // instead of folding over zero cutoffs
    val cuts0 = base.stat.approxQuantile(
      Array("recency_days", "frequency", "monetary_dbl"), probs, relErr)
    val cuts =
      if (cuts0.exists(_.isEmpty)) Array.fill(3)(Array(Double.MaxValue))
      else cuts0
    def above(c: Column, qs: Array[Double]): Column =
      qs.map(q => when(c > q, 1).otherwise(0)).reduce(_ + _) + 1
    def below(c: Column, qs: Array[Double]): Column =
      qs.map(q => when(c < q, 1).otherwise(0)).reduce(_ + _) + 1
    val scored = base
      // recency scores DESCENDING (recent = high score): below-cutoff counts
      .withColumn("r_score", below(col("recency_days"), cuts(0)).cast("int"))
      .withColumn("f_score", above(col("frequency"), cuts(1)).cast("int"))
      .withColumn("m_score", above(col("monetary_dbl"), cuts(2)).cast("int"))
    deriveSegments(scored)
  }

  /** Driver-gated equivalence report for [[buildAtScale]] vs [[build]]:
    * per score dimension, the joined user count plus two violation
    * counters that are zero by construction —
    *
    *  - `n_drift_violations`: users whose approx score leaves the
    *    provable |Δ| ≤ tie-span+1 bound (cutoff scoring differs from
    *    ntile only inside metric tie groups straddling a quintile
    *    boundary, ±1 for the rank convention at the cut value);
    *  - `n_monotone_violations`: metric-value pairs where a better
    *    metric received a lower approx score.
    *
    * Both paths are deterministic, so the DuckDB oracle can recompute
    * the purchasing-user count exactly and pin the violation counts at
    * zero — turning the scalable path's rows-only entry into a green
    * hash row that goes red on any scoring regression. */
  def scalableEquivalenceReport(silver: DataFrame): DataFrame = {
    // both frames are |purchasing users|-sized — checkpoint once so the
    // three per-dimension passes below reread materialized rows
    val exact = build(silver).localCheckpoint()
    val approx = buildAtScale(silver).localCheckpoint()
    val e = exact.select(col("user_id"),
      col("recency_days"), col("frequency"), col("monetary"),
      col("r_score").as("e_r"), col("f_score").as("e_f"), col("m_score").as("e_m"))
    val a = approx.select(col("user_id"),
      col("r_score").as("a_r"), col("f_score").as("a_f"), col("m_score").as("a_m"))
    val joined = e.join(a, Seq("user_id"), "full_outer")
    val dims = Seq(("r_score", "recency_days", false),
                   ("f_score", "frequency", true),
                   ("m_score", "monetary", true))
    dims.map { case (s, m, asc) =>
      val short = s.substring(0, 1)
      val span = exact.groupBy(col(m).as("mv"))
        .agg((max(col(s)) - min(col(s))).as("tie_span"))
      val drift = joined.join(span, col(m) === col("mv"), "left").agg(
        count(lit(1)).as("n_users"),
        countIf(col(s"e_$short").isNull || col(s"a_$short").isNull ||
          abs(col(s"e_$short") - col(s"a_$short")) > coalesce(col("tie_span"), lit(0)) + 1)
          .as("n_drift_violations"))
      // value-level monotonicity: for metric values x better-than y,
      // no x-user may score below a y-user (tiny frame: |distinct values|)
      val lvl = approx.groupBy(col(m)).agg(min(col(s)).as("smin"), max(col(s)).as("smax"))
      val mono = lvl.as("x").join(lvl.as("y"),
          if (asc) col(s"x.$m") < col(s"y.$m") else col(s"x.$m") > col(s"y.$m"))
        .filter(col("x.smax") > col("y.smin"))
        .agg(count(lit(1)).as("n_monotone_violations"))
      drift.crossJoin(mono).select(lit(s).as("score_dim"),
        col("n_users"), col("n_drift_violations"), col("n_monotone_violations"))
    }.reduce(_ unionAll _).orderBy("score_dim")
  }

  /** One cutoff for [[scalableSql]]: the value at ascending rank
    * ceil(p·n) — exactly what [[buildAtScale]]'s approxQuantile
    * returns at relErr = 0 (QuantileSummaries keeps every sample at
    * eps = 0 and `query` targets rank ceil(p·count); DuckDB's own
    * quantile_disc uses a floor(p·(n−1))+1 convention that disagrees
    * whenever an integer falls in (p·n−p, p·n), so the oracle computes
    * Spark's convention directly instead of calling it). */
  private def cutSql(metric: String, p: Double): String =
    s"""(SELECT v FROM
       |   (SELECT $metric AS v, row_number() OVER (ORDER BY $metric) AS rn FROM base) rk,
       |   (SELECT count(*) AS n FROM base) nn
       | WHERE rk.rn = CAST(ceil($p * nn.n) AS BIGINT))""".stripMargin

  /** Exact DuckDB oracle for the sketch-scored segments ([[buildAtScale]]
    * at the relErr = 0 default): same per-user CTE as the exact mart,
    * cutoffs per [[cutSql]], then the shared comparison-chain scoring
    * and segment/CLV derivation. */
  val scalableSql: String = {
    val probs = Seq(0.2, 0.4, 0.6, 0.8)
    def cuts(metric: String, pfx: String): String =
      probs.zipWithIndex.map { case (p, i) =>
        s"${cutSql(metric, p)} AS ${pfx}${i + 1}" }.mkString(",\n  ")
    def above(metric: String, pfx: String): String =
      probs.indices.map(i =>
        s"CASE WHEN $metric > ${pfx}${i + 1} THEN 1 ELSE 0 END").mkString(" + ")
    def below(metric: String, pfx: String): String =
      probs.indices.map(i =>
        s"CASE WHEN $metric < ${pfx}${i + 1} THEN 1 ELSE 0 END").mkString(" + ")
    SilverEvents.oracleCte +
    s"""
      |, per_user AS (
      |  SELECT
      |    user_id,
      |    max(event_date) AS last_purchase_date,
      |    count(*) AS frequency,
      |    round(sum(CAST(coalesce(price, 0) AS DECIMAL(18,2))), 2) AS monetary_dec
      |  FROM silver
      |  WHERE event_type = 'purchase'
      |  GROUP BY user_id
      |), base AS (
      |  SELECT *,
      |    CAST(date_diff('day', last_purchase_date, DATE '${Params.AsOfDate}') AS INT) AS recency_days,
      |    CAST(monetary_dec AS DOUBLE) AS monetary_dbl
      |  FROM per_user
      |), cuts AS (SELECT
      |  ${cuts("recency_days", "r")},
      |  ${cuts("frequency", "f")},
      |  ${cuts("monetary_dbl", "m")}
      |), scored AS (
      |  SELECT base.*,
      |    CAST((${below("recency_days", "r")}) + 1 AS INT) AS r_score,
      |    CAST((${above("frequency", "f")}) + 1 AS INT) AS f_score,
      |    CAST((${above("monetary_dbl", "m")}) + 1 AS INT) AS m_score
      |  FROM base, cuts
      |)
      |SELECT
      |  user_id, last_purchase_date, recency_days, frequency,
      |  monetary_dbl AS monetary,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'CHAMPION'
      |       WHEN r_score >= 3 AND f_score >= 3 THEN 'LOYAL'
      |       WHEN r_score >= 4 AND f_score <= 2 THEN 'NEW_CUSTOMER'
      |       WHEN r_score <= 2 AND f_score >= 3 THEN 'AT_RISK'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'HIBERNATING'
      |       ELSE 'REGULAR' END AS rfm_segment,
      |  CAST(round(monetary_dec * CAST(1.5 AS DECIMAL(2,1)), 2) AS DOUBLE) AS clv_estimate
      |FROM scored
      |ORDER BY user_id""".stripMargin
  }

  /** Oracle for [[scalableEquivalenceReport]]: purchasing-user count
    * exactly (NULL user group included, as GROUP BY keeps it), zero
    * violations per dimension. */
  val scalableEquivalenceSql: String = SilverEvents.oracleCte + """
      |, u AS (SELECT count(*) AS n_users
      |        FROM (SELECT DISTINCT user_id FROM silver WHERE event_type = 'purchase'))
      |SELECT m.score_dim, u.n_users,
      |  CAST(0 AS BIGINT) AS n_drift_violations,
      |  CAST(0 AS BIGINT) AS n_monotone_violations
      |FROM u, (VALUES ('f_score'), ('m_score'), ('r_score')) AS m(score_dim)
      |ORDER BY score_dim""".stripMargin

  val oracleSql: String = SilverEvents.oracleCte +
    s"""
      |, per_user AS (
      |  SELECT
      |    user_id,
      |    max(event_date) AS last_purchase_date,
      |    count(*) AS frequency,
      |    round(sum(CAST(coalesce(price, 0) AS DECIMAL(18,2))), 2) AS monetary_dec
      |  FROM silver
      |  WHERE event_type = 'purchase'
      |  GROUP BY user_id
      |), scored AS (
      |  SELECT *,
      |    CAST(date_diff('day', last_purchase_date, DATE '${Params.AsOfDate}') AS INT) AS recency_days,
      |    ntile(5) OVER (ORDER BY date_diff('day', last_purchase_date, DATE '${Params.AsOfDate}') DESC, user_id ASC) AS r_score,
      |    ntile(5) OVER (ORDER BY frequency ASC, user_id ASC) AS f_score,
      |    ntile(5) OVER (ORDER BY monetary_dec ASC, user_id ASC) AS m_score
      |  FROM per_user
      |)
      |SELECT
      |  user_id, last_purchase_date, recency_days, frequency,
      |  CAST(monetary_dec AS DOUBLE) AS monetary,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'CHAMPION'
      |       WHEN r_score >= 3 AND f_score >= 3 THEN 'LOYAL'
      |       WHEN r_score >= 4 AND f_score <= 2 THEN 'NEW_CUSTOMER'
      |       WHEN r_score <= 2 AND f_score >= 3 THEN 'AT_RISK'
      |       WHEN r_score <= 2 AND f_score <= 2 THEN 'HIBERNATING'
      |       ELSE 'REGULAR' END AS rfm_segment,
      |  CAST(round(monetary_dec * CAST(1.5 AS DECIMAL(2,1)), 2) AS DOUBLE) AS clv_estimate
      |FROM scored
      |ORDER BY user_id""".stripMargin
}
