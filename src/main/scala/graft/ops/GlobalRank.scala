package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global ranking without the single-partition window.
  *
  * `ntile(k) OVER (ORDER BY …)` / `row_number() OVER (ORDER BY …)`
  * force every row through ONE partition — the scale-killer the
  * reference's RFM model inherits from its SQL form
  * (gold_user_rfm_segments.sql:43-45). This operator computes the same
  * exact ranks distributed:
  *
  *  1. range-repartition on the order keys (Spark's distributed sort
  *     machinery — the same exchange `ORDER BY` itself plans);
  *  2. per-partition local row number via `monotonically_increasing_id`
  *     on the partition-sorted data (narrow — no window, no shuffle);
  *  3. global rank = local + offset, where the offsets come from the
  *     one-row-per-partition count frame (≤ numPartitions rows,
  *     prefix-summed with a tiny triangular self-join and broadcast
  *     back — deliberately window-free so nothing in the plan ever
  *     warns "moving all data to a single partition").
  *
  * The rank is invariant to where the range boundaries land (the order
  * must be TOTAL — include a tie-breaker), so results are partitioning-
  * stable. Both branches read the same range exchange; Catalyst's
  * ReuseExchange dedups the shuffle.
  */
object GlobalRank {

  private val Pid = "__graft_pid"
  private val Local = "__graft_local"
  private val Off = "__graft_off"
  private val Total = "__graft_total"

  /** Adds `rankCol` = exact global row_number under `order` (must be a
    * total order) and `totalCol` = the frame's row count. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
                          rankCol: String, totalCol: String): DataFrame = {
    val ranged = df.repartitionByRange(order: _*)
    val counts = ranged
      .select(spark_partition_id().as(Pid))
      .groupBy(col(Pid)).agg(count(lit(1)).as("__graft_cnt"))
    // prefix sum over ≤ numPartitions rows: triangular self-join keeps
    // the plan window-free (a partitionless window here would be
    // harmless but would still trip Spark's single-partition warning).
    val offsets = counts.as("c")
      .join(counts.as("p"), col(s"p.$Pid") < col(s"c.$Pid"), "left")
      .groupBy(col(s"c.$Pid").as(Pid))
      .agg(coalesce(sum(col("p.__graft_cnt")), lit(0L)).as(Off))
      .crossJoin(broadcast(counts.agg(sum(col("__graft_cnt")).as(Total))))
    // monotonically_increasing_id = (pid << 33) | in-partition index,
    // so masking the low 33 bits of the id on partition-sorted rows
    // yields the local row number — no per-partition window needed.
    ranged.sortWithinPartitions(order: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn(Local,
        (monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))) + 1)
      .join(broadcast(offsets), Seq(Pid))
      .withColumn(rankCol, col(Off) + col(Local))
      .withColumn(totalCol, col(Total))
      .drop(Pid, Local, Off, Total)
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
