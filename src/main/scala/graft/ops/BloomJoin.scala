package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.BloomPrune
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Bloom-filter semi-join pruning — the manual form of the runtime
  * filter AQE injects for shuffle joins (Spark's `InjectRuntimeFilter`
  * / the classic "bloom-filtered join" of the Exadata/Snowflake
  * lineage): build a Bloom filter over the SMALL side's join keys with
  * one distributed aggregate, ship the sketch (KBs–MBs — broadcast
  * state, same class as trained ANN codebooks) back through the
  * driver, and pre-filter the BIG side with a codegen'd probe BEFORE
  * the join.
  *
  * Why it matters at 100 TB: the probe side is pruned AT THE SCAN —
  * rows that cannot join are dropped before they are shuffled, so the
  * exchange moves ~selectivity × |probe| rows instead of |probe|. The
  * result stays EXACT: Bloom false positives (~fpp of non-matching
  * rows) survive the pre-filter but are removed by the exact join that
  * follows — which is why the whole operator is DuckDB-oracle-checkable
  * against the plain join, false negatives being impossible.
  *
  * Reference behavior mirrored: the warehouse jobs join the full fact
  * table against selective dimension subsets (e.g. the top-item /
  * category-performance jobs); this operator is the scan-side prune
  * those jobs rely on their engine to inject. */
object BloomJoin {

  /** Serialized Bloom filter of `key` over `build` — one distributed
    * aggregate; the driver receives only the sketch bytes. Counts the
    * build side first to size the filter (the build side is the small
    * side by contract; callers with a known cardinality estimate can
    * pass `expectedItems` and skip the count). */
  def keyFilter(build: DataFrame, key: Column, fpp: Double = 0.01,
                expectedItems: Long = -1L): Array[Byte] = {
    val n = if (expectedItems > 0) expectedItems else math.max(build.count(), 1L)
    // sketch-sized driver hop (optimalNumBits(n, fpp)/8 bytes): the
    // production broadcast shape, NOT a data collect
    build.select(BloomPrune.bloomFilterAgg(key, n, fpp).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** `probe` pre-filtered to keys that MIGHT be in `build` (false
    * positives at ~fpp, never false negatives) — the scan-side prune.
    * Pair with the exact join for exact results, or use alone as an
    * approximate semi-join where fpp leakage is acceptable. */
  def prune(probe: DataFrame, probeKey: Column, build: DataFrame,
            buildKey: Column, fpp: Double = 0.01): DataFrame =
    probe.filter(BloomPrune.mightContain(keyFilter(build, buildKey, fpp), probeKey))

  /** Bloom-pruned exact inner equi-join: prune, then join. Exact —
    * the join removes the fpp leakage. The build side is materialized
    * once (it is the SMALL side by contract) so the sizing count, the
    * bloom aggregate and the join all read one computation instead of
    * re-running the build plan three times; join keys are resolved
    * against their own DataFrames, so probeKey == buildKey (the common
    * equi-join spelling) is not ambiguous. */
  def prunedEquiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
                     buildKey: String, fpp: Double = 0.01): DataFrame = {
    val b = build.localCheckpoint()
    val pruned = prune(probe, col(probeKey), b, b(buildKey), fpp)
    pruned.join(b, pruned(probeKey) === b(buildKey))
  }

  /** Exact-decimal discounted revenue (the PricingSummary contract —
    * per-row double rounding would diverge from the oracle). */
  private def discRevenue = col("l_extendedprice").cast(DecimalType(18, 2)) *
    (lit(1).cast(DecimalType(3, 0)) - col("l_discount").cast(DecimalType(4, 2)))

  private val discRevenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  /** Monthly discounted revenue of lineitems belonging to urgent
    * high-value orders: the build side (selective order subset) blooms
    * its keys, the lineitem scan is pruned pre-shuffle, the exact join
    * makes the result independent of fpp — hash-identical to the plain
    * join the oracle runs. */
  def bloomPruneRevenue(s: SparkSession, dir: String): DataFrame = {
    val hot = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
      .select(col("o_orderkey"))
    prunedEquiJoin(Tables.lineitem(s, dir), "l_orderkey", hot, "o_orderkey")
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(ConditionalAgg.moneySumExact(discRevenue).as("revenue"),
        count(lit(1)).as("line_count"),
        count_distinct(col("l_orderkey")).as("hot_orders"))
      .orderBy(col("ship_month"))
  }

  val bloomPruneRevenueSql: String =
    s"""SELECT
       |  strftime(l_shipdate, '%Y-%m') AS ship_month,
       |  CAST(round(sum($discRevenueSql), 2) AS DOUBLE) AS revenue,
       |  count(*) AS line_count,
       |  count(DISTINCT l_orderkey) AS hot_orders
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
}
