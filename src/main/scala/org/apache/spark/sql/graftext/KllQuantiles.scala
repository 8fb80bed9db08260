package org.apache.spark.sql.graftext

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KLL quantile sketch partials (Karnin–Lang–Liberty, "Optimal
  * quantile approximation in streams", FOCS'16; Datasketches
  * `KllDoublesSketch`) — MERGEABLE percentiles, the quantile analog
  * of the HLL/theta distinct partials.
  *
  * Why this exists next to `approx_percentile`: Spark's built-in is a
  * one-shot aggregate — its internal summary cannot be persisted as a
  * column, so every window/rollup re-reads the raw rows. A KLL
  * partial IS a column (BINARY): sketch each day once, persist |days|
  * KB-sized rows, then answer p50/p90/p99 over ANY rolling window by
  * merging partials — the same scan-once / metadata-join shape as
  * SketchRollup's distinct-users query. At 100 TB the raw-value
  * rescans are the dominant cost; partials make every additional
  * window size (7d, 28d, 90d, …) free.
  *
  * Error contract: k=200 gives normalized rank error ≈ 1.65 %
  * (99 % conf, `KllSketch.getNormalizedRankError`); merge preserves
  * the bound (merged sketch ≡ a sketch of the concatenated streams).
  * KLL compaction flips library-internal random coins, so two runs
  * may retain different samples — estimates move WITHIN the rank
  * bound but are not byte-identical across partitionings. Queries
  * gate on the bound (oracle recomputes exact ranks), and
  * `tools/stability_check.py` explicitly excludes the KLL-backed
  * outputs (`RANDOMIZED_SKETCH_QUERIES`) from its byte-stability
  * compare — the honest contract for a randomized sketch.
  */
abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** kll_doubles_agg(expr, k): BINARY KLL partial of the group's value
  * distribution. Nulls are skipped. */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase with ExpectsInputTypes {

  require(k >= 8 && k <= 65535, s"k out of range: $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def prettyName: String = "kll_doubles_agg"

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** kll_merge_agg(sketch_bin, k): merge persisted KLL partials — the
  * rollup face. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def prettyName: String = "kll_merge_agg"

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** kll_quantile(sketch_bin, rank): INCLUSIVE-criteria quantile at
  * normalized rank ∈ [0,1]; NULL for an empty sketch. Runs on
  * metadata-sized merged frames — CodegenFallback costs nothing. */
// ImplicitCastInputTypes (not bare ExpectsInputTypes): a SQL-first
// caller writes `kll_quantile(sk, 0.5)` and the 0.5 parses as
// DECIMAL(1,1) — without implicit coercion the GraftExtensions SQL
// registration rejects the most natural call shape
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(bin: Any, rank: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** kll_ks_delta(sketch_a, sketch_b): the two-sample Kolmogorov–
  * Smirnov statistic sup|F_a − F_b| estimated from two KLL partials
  * (Datasketches `KolmogorovSmirnov.computeKSDelta` — evaluated at
  * every retained split point of both sorted views). Error is bounded
  * by the two sketches' summed rank errors (2 × 1.65 % at k=200), so
  * distribution DRIFT between corpus slices is detectable from the
  * same persisted per-slice partials that serve the percentile
  * queries — no raw re-scan, no all-values pairwise CDF build. */
case class KllKsDelta(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_ks_delta"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = KllDoublesSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = KllDoublesSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    org.apache.datasketches.quantilescommon.KolmogorovSmirnov.computeKSDelta(sa, sb)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object KllQuantiles {
  /** k=200: ~1.65 % normalized rank error at 99 % confidence, sketch
    * ≤ a few KB — a decade of daily partials stays broadcast-sized. */
  val DefaultK = 200

  def kllDoublesAgg(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KllDoublesAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  def kllMergeAgg(c: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KllMergeAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  def kllQuantile(c: Column, rank: Column): Column =
    ExpressionUtils.column(
      KllQuantile(ExpressionUtils.expression(c), ExpressionUtils.expression(rank)))

  def kllKsDelta(a: Column, b: Column): Column =
    ExpressionUtils.column(
      KllKsDelta(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
