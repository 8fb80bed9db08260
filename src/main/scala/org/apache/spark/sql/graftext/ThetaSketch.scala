package org.apache.spark.sql.graftext

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct-count SET ALGEBRA (Datasketches theta — the
  * KMV "keep the k smallest hashes" sketch). This is the capability
  * HLL cannot provide: HLL registers only UNION; theta sketches keep
  * actual hash samples, so INTERSECTION and DIFFERENCE (A∧B, A\B)
  * compose from the same persisted partials — "distinct users who
  * purchased AND viewed", "signed up but never purchased" — answered
  * from metadata-sized sketch tables without rescanning events.
  *
  * Mergeability / determinism contract (what makes this safe as a
  * persisted partial at 100 TB): partial merge is associative,
  * commutative and idempotent — a union's ESTIMATE is always within
  * the RSE bound of the true distinct count regardless of merge
  * order. Byte-stability is scoped by mode:
  *  - EXACT mode (≤ k distincts per segment): the sketch retains the
  *    full hash set, the result is a pure function of the input set,
  *    and the ordered compact serialization is byte-stable under any
  *    partitioning (pinned by SketchSetOpsSpec split-merge equality).
  *  - ESTIMATION mode (> k distincts): the union's θ and retained
  *    set can depend on merge ORDER (early θ tightening), so two
  *    partitionings may serialize different-but-equivalent partials;
  *    only estimate-level agreement within the RSE budget is
  *    guaranteed (pinned by SketchSetOpsSpec's estimation-mode
  *    merge-order test). Queries that persist partials at scales
  *    beyond k therefore gate on estimates, never on partial bytes.
  * Hashing is murmur3 with the library default seed over the UTF-8
  * bytes of the string form — stable across JVMs.
  *
  * Sizing: nominal k = 2^lgK hashes ⇒ RSE ≈ 1/√k in estimation mode
  * (lgK=12 → 1.6 %); below k retained the sketch is EXACT. Compact
  * sketches are ≤ 8·k bytes — a decade of daily partials is still
  * broadcastable state. Intersection error grows relative to the
  * intersection when |A∩B| ≪ |A∪B| (Datasketches bounds apply); the
  * oracle gate on the audience-overlap query budgets 5 % + 3.
  */
final class ThetaUnionBuffer(val lgK: Int) {
  val union: Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  def result: CompactSketch = union.getResult(true, null)
}

abstract class ThetaAggBase extends TypedImperativeAggregate[ThetaUnionBuffer] {
  def lgK: Int
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ThetaUnionBuffer = new ThetaUnionBuffer(lgK)

  override def merge(buf: ThetaUnionBuffer, other: ThetaUnionBuffer): ThetaUnionBuffer = {
    buf.union.union(other.result)
    buf
  }

  /** Ordered compact form — the canonical (byte-stable) serialization. */
  override def eval(buf: ThetaUnionBuffer): Any = buf.result.toByteArray

  override def serialize(buf: ThetaUnionBuffer): Array[Byte] = buf.result.toByteArray

  override def deserialize(bytes: Array[Byte]): ThetaUnionBuffer = {
    val buf = new ThetaUnionBuffer(lgK)
    buf.union.union(Memory.wrap(bytes))
    buf
  }
}

/** theta_sketch_agg(expr, lgK): BINARY theta partial of the distinct
  * items in the group. Strings hash over UTF-8 bytes; numeric inputs
  * should be cast to string by the caller so Spark- and oracle-side
  * item identity agree. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase with ExpectsInputTypes {

  require(lgK >= 4 && lgK <= 26, s"lgK out of range: $lgK")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def prettyName: String = "theta_sketch_agg"

  override def update(buf: ThetaUnionBuffer, input: InternalRow): ThetaUnionBuffer = {
    val v = child.eval(input)
    if (v != null) buf.union.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** theta_union_agg(sketch_bin, lgK): register-free union of persisted
  * theta partials — the rollup face (mirror of `hll_union_agg`). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def prettyName: String = "theta_union_agg"

  override def update(buf: ThetaUnionBuffer, input: InternalRow): ThetaUnionBuffer = {
    val v = child.eval(input)
    if (v != null) buf.union.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Scalar set-algebra over serialized sketches. These run on
  * metadata-sized frames (|group keys| rows of KB-sized binaries), so
  * CodegenFallback costs nothing measurable; the data-volume work
  * already happened in the sketch aggregate. */
abstract class ThetaBinaryOp extends BinaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  protected def wrap(v: Any): Sketch =
    CompactSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
}

/** theta_intersect(a, b): sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildIntersection()
      .intersect(wrap(a), wrap(b), true, null).toByteArray
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** theta_a_not_b(a, b): sketch of A \ B. */
case class ThetaANotB(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_a_not_b"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b), true, null).toByteArray
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** theta_union_pair(a, b, lgK): sketch of A ∪ B. */
case class ThetaUnionPair(left: Expression, right: Expression, lgK: Int)
    extends ThetaBinaryOp {
  override def prettyName: String = "theta_union_pair"
  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      .union(wrap(a), wrap(b), true, null).toByteArray
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** theta_estimate(sketch): distinct-count estimate (exact when the
  * sketch never exceeded its nominal k). */
case class ThetaEstimate(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(v: Any): Any =
    CompactSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ThetaSketch {
  /** Default 2^12 = 4096 nominal hashes: 1.6 % RSE in estimation
    * mode, ≤ 32 KB compact, exact below 4096 distincts. */
  val DefaultLgK = 12

  def thetaSketchAgg(c: Column, lgK: Int = DefaultLgK): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(c), lgK).toAggregateExpression())

  def thetaUnionAgg(c: Column, lgK: Int = DefaultLgK): Column =
    ExpressionUtils.column(
      ThetaUnionAgg(ExpressionUtils.expression(c), lgK).toAggregateExpression())

  def thetaIntersect(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ThetaIntersect(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def thetaANotB(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ThetaANotB(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def thetaUnionPair(a: Column, b: Column, lgK: Int = DefaultLgK): Column =
    ExpressionUtils.column(
      ThetaUnionPair(ExpressionUtils.expression(a), ExpressionUtils.expression(b), lgK))

  def thetaEstimate(c: Column): Column =
    ExpressionUtils.column(ThetaEstimate(ExpressionUtils.expression(c)))
}
