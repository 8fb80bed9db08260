package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global ranking without the single-partition window.
  *
  * `ntile(k) OVER (ORDER BY …)` / `row_number() OVER (ORDER BY …)`
  * force every row through ONE partition — the scale-killer the
  * reference's RFM model inherits from its SQL form
  * (gold_user_rfm_segments.sql:43-45). This operator computes the same
  * exact ranks distributed (the classic sort + zipWithIndex offset
  * pattern, kept in DataFrame land):
  *
  *  1. range-repartition on the order keys with an EXPLICIT partition
  *     count (a pinned count keeps AQE from re-coalescing the exchange
  *     differently between the two jobs below);
  *  2. local row number = the low 33 bits of
  *     `monotonically_increasing_id` on the partition-sorted data
  *     (narrow — no window, no extra shuffle);
  *  3. one lightweight job collects the ≤ numPartitions per-partition
  *     counts; their prefix sums are injected back as a literal
  *     pid→offset map (codegen'd lookup, no join).
  *
  * The driver-side collect is numPartitions longs — the same scale of
  * driver state Spark's own RangePartitioner samples; the data plane
  * itself never converges. Ranks are invariant to where the range
  * boundaries land (the order must be TOTAL — include a tie-breaker),
  * so results are partitioning-stable.
  */
object GlobalRank {

  private val Pid = "__graft_pid"
  private val Local = "__graft_local"

  /** Adds `rankCol` = exact global row_number under `order` (must be a
    * total order) and `totalCol` = the frame's row count. Runs one
    * small counting job eagerly (documented above). */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
                          rankCol: String, totalCol: String): DataFrame = {
    val numParts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // The checkpoint AFTER the range exchange is load-bearing: the
    // counting job and the final job are separate query executions,
    // and RangePartitioner seeds its boundary sampler from the RDD id
    // — which differs per execution — so re-running the exchange can
    // land rows in different partitions than the ones the collected
    // counts describe (surfaced as off-by-a-few NTILE boundaries at
    // 15k rows). Materializing the partitioned+numbered frame freezes
    // pid/local-id, and every downstream job reads the same layout.
    val sorted = df.repartitionByRange(numParts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn(Local,
        (monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))) + 1)
      .localCheckpoint()
    val counts = sorted.groupBy(col(Pid)).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(offsets), col(Pid)), lit(0L))
    sorted
      .withColumn(rankCol, offCol + col(Local))
      .withColumn(totalCol, lit(total))
      .drop(Pid, Local)
  }

  /** SQL NTILE(k) bucket for global rank `rn` of `n` rows: the first
    * n%k buckets take ceil(n/k) rows, the rest floor(n/k) — identical
    * to the window function's semantics. Doubles are exact here until
    * n ~ 2⁵³ rows. */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val q = floor(n / k)
    val r = n - q * k
    val head = r * (q + 1)
    when(rn <= head, floor((rn - 1) / (q + 1)) + 1)
      .otherwise(r + floor((rn - head - 1) / q) + 1)
      .cast("int")
  }

  /** One-call form: adds `outCol` = exact NTILE(k) under `order`. */
  def withNtile(df: DataFrame, order: Seq[Column], k: Int, outCol: String): DataFrame =
    withGlobalRowNumber(df, order, "__graft_rn", "__graft_n")
      .withColumn(outCol, ntileOf(col("__graft_rn"), col("__graft_n"), k))
      .drop("__graft_rn", "__graft_n")
}
