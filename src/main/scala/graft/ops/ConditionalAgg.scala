package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Conditional ("pivot by CASE") aggregate helpers — the dominant
  * aggregation idiom of the reference (SURVEY §2.4 A1–A12; e.g.
  * reference dbt/models/gold/core/gold_daily_sales_summary.sql:15-17,
  * gold_product_performance.sql:16-27).
  *
  * All helpers are thin wrappers over `org.apache.spark.sql.functions`
  * so everything stays inside whole-stage codegen and Catalyst's
  * partial/final HashAggregate split (map-side combine at scale).
  *
  * Determinism contract (SURVEY §7.6 #3): money sums go through
  * `DecimalType(18,2)` so the result is independent of partition /
  * combine order — a DOUBLE sum over 100 TB would differ run to run.
  */
object ConditionalAgg {

  /** COUNT(CASE WHEN cond THEN 1 END)  (A2) */
  def countIf(cond: Column): Column = count(when(cond, 1))

  /** COUNT(DISTINCT CASE WHEN cond THEN c END)  (A3) — exact. At 100 TB
    * prefer [[approxCountDistinctIf]] (HLL, no exact-distinct shuffle). */
  def countDistinctIf(cond: Column, c: Column): Column = count_distinct(when(cond, c))

  /** HLL-sketch variant of A3 for the 100 TB path: mergeable partial
    * aggregates, no per-key distinct expansion. */
  def approxCountDistinctIf(cond: Column, c: Column, rsd: Double = 0.01): Column =
    approx_count_distinct(when(cond, c), rsd)

  /** SUM(CASE WHEN cond THEN x ELSE 0 END)  (A1) */
  def sumIf(cond: Column, x: Column): Column = sum(when(cond, x).otherwise(lit(0)))

  /** Order-independent money sum: per-row cast to DECIMAL(18,2), exact
    * decimal sum, surfaced as a 2-dp DOUBLE (serving type, reference
    * clickhouse/create_tables.sql:10 Decimal(15,2)). */
  def moneySum(x: Column): Column =
    round(sum(x.cast(DecimalType(18, 2))), 2).cast(DoubleType)

  /** Conditional money sum; NULL amounts count as 0 inside the branch. */
  def moneySumIf(cond: Column, x: Column): Column =
    moneySum(when(cond, coalesce(x, lit(0))).otherwise(lit(0)))

  /** Money sum for columns that are ALREADY exact decimals: sums at full
    * scale, rounds once at the end. (Per-row rescale would diverge from
    * the oracle — DuckDB truncates decimal→decimal downcasts where Spark
    * rounds HALF_UP.) */
  def moneySumExact(x: Column): Column =
    round(sum(x), 2).cast(DoubleType)

  /** Cross-engine-portable rounding of a computed DOUBLE: Spark's
    * round() sees the double's SHORTEST string ("1.025" for 123/120)
    * where other engines round the binary value (1.02499…) — ties
    * resolve differently. Routing through DECIMAL(28,10) first makes
    * both agree: nearest-10-digit-decimal equals the shortest string
    * for any ratio of integers below ~2×10⁷. Mirror in oracle SQL via
    * [[roundPortableSql]]. */
  def roundPortable(x: Column, scale: Int): Column =
    round(x.cast(DecimalType(28, 10)), scale).cast(DoubleType)

  /** The DuckDB-side twin of [[roundPortable]]. */
  def roundPortableSql(expr: String, scale: Int): String =
    s"CAST(round(CAST($expr AS DECIMAL(28,10)), $scale) AS DOUBLE)"

  /** ROUND(num / NULLIF(den, 0), scale)  (A10 divide-by-zero guard,
    * reference gold_daily_sales_summary.sql:20-24). */
  def ratio(num: Column, den: Column, scale: Int = 2): Column =
    roundPortable(num.cast(DoubleType) / nullif(den.cast(DoubleType), lit(0.0)), scale)

  /** ROUND(100.0 * num / NULLIF(den, 0), scale) — percentage form. */
  def pct(num: Column, den: Column, scale: Int = 2): Column =
    roundPortable(lit(100.0) * num.cast(DoubleType) / nullif(den.cast(DoubleType), lit(0.0)), scale)
}
