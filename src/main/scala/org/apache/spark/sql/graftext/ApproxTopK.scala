package org.apache.spark.sql.graftext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al., "Efficient computation of frequent
  * and top-k elements in data streams") summary: tracks at most
  * `capacity` items; untracked arrivals evict the current minimum and
  * inherit its count as their error bound. Counts are exact whenever
  * the true distinct count ≤ capacity. */
final class SpaceSavingBuffer(val capacity: Int) {
  // item -> (estimated count, max overestimation error)
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def add(item: String, inc: Long = 1L, err: Long = 0L): Unit =
    counts.get(item) match {
      case Some((c, e)) => counts.update(item, (c + inc, e + err))
      case None if counts.size < capacity => counts.update(item, (inc, err))
      case None =>
        val (minItem, (minC, _)) = counts.minBy { case (i, (c, _)) => (c, i) }
        counts.remove(minItem)
        // new item may have occurred up to minC times before tracking
        counts.update(item, (minC + inc, minC + err))
    }

  /** Mergeable-summaries combine: add the other side's entries with
    * their counts/errors, then trim back to capacity keeping the
    * largest estimates (deterministic tie-break on the item). */
  def merge(other: SpaceSavingBuffer): SpaceSavingBuffer = {
    other.counts.foreach { case (i, (c, e)) =>
      counts.get(i) match {
        case Some((c0, e0)) => counts.update(i, (c0 + c, e0 + e))
        case None => counts.update(i, (c, e))
      }
    }
    if (counts.size > capacity) {
      val keep = counts.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      counts.clear()
      counts ++= keep
    }
    this
  }

  def topK(k: Int): Seq[(String, Long, Long)] =
    counts.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
      .map { case (i, (c, e)) => (i, c, e) }
}

object SpaceSavingBuffer {
  /** Canonical serialization (items in sorted order — the partial is
    * byte-stable in exact mode, where the tracked set is a pure
    * function of the input multiset). */
  def toBytes(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.toSeq.sortBy(_._1).foreach { case (i, (c, e)) =>
      out.writeUTF(i); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val i = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      buf.counts.update(i, (c, e))
    }
    buf
  }
}

/** approx_top_k_ss(expr, k, capacity): heavy-hitters aggregate as a
  * native TypedImperativeAggregate (the aggregate tier of SURVEY
  * §7.4's custom-op ladder, alongside the CosineSimilarity scalar
  * tier). At 100 TB this answers "top items per group" with one pass
  * and O(capacity) state per group — no full-cardinality groupBy
  * shuffle; partials merge associatively like any Spark aggregate.
  *
  * Returns ARRAY<STRUCT<item STRING, count_est BIGINT, count_err
  * BIGINT>> sorted by (count desc, item) — exact when the group's
  * distinct count ≤ capacity (count_err = 0).
  */
case class ApproxTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with ExpectsInputTypes {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count_est", LongType),
    StructField("count_err", LongType))))
  override def prettyName: String = "approx_top_k_ss"

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer =
    buf.merge(other)

  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(buf.topK(k).map { case (i, c, e) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] =
    SpaceSavingBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** approx_top_k_partial(expr, capacity): the group's SpaceSaving
  * summary as a persistable BINARY column — the heavy-hitter analog
  * of the HLL/theta/KLL partials: sketch each day/segment once, keep
  * |segments| KB-sized rows, then answer top-k over ANY combination
  * of segments by merging partials ([[ApproxTopKMerge]]) without
  * re-reading the raw rows. Exact (count_err = 0) while the group's
  * distinct count stays ≤ capacity; beyond that, counts carry the
  * documented SpaceSaving over-estimation bound. */
case class ApproxTopKPartial(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with ExpectsInputTypes {

  require(capacity > 0, s"need capacity > 0, got $capacity")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "approx_top_k_partial"

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer =
    buf.merge(other)
  override def eval(buf: SpaceSavingBuffer): Any = SpaceSavingBuffer.toBytes(buf)
  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = SpaceSavingBuffer.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKPartial =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKPartial =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** approx_top_k_merge(partials, k, capacity): fold BINARY SpaceSaving
  * partials ([[ApproxTopKPartial]]) and emit the merged top-k in the
  * same ARRAY<STRUCT<item, count_est, count_err>> layout as
  * [[ApproxTopK]] — the query-time face of the persisted sketch
  * table. */
case class ApproxTopKMerge(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with ExpectsInputTypes {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count_est", LongType),
    StructField("count_err", LongType))))
  override def prettyName: String = "approx_top_k_merge"

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.merge(SpaceSavingBuffer.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer =
    buf.merge(other)

  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(buf.topK(k).map { case (i, c, e) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = SpaceSavingBuffer.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKMerge =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ApproxTopK {
  /** Column-API entry point. */
  def approxTopK(c: Column, k: Int, capacity: Int): Column =
    ExpressionUtils.column(
      ApproxTopK(ExpressionUtils.expression(c), k, capacity).toAggregateExpression())

  /** BINARY SpaceSaving partial of the group (persistable/mergeable). */
  def approxTopKPartial(c: Column, capacity: Int): Column =
    ExpressionUtils.column(
      ApproxTopKPartial(ExpressionUtils.expression(c), capacity).toAggregateExpression())

  /** Merge BINARY partials → top-k struct array. */
  def approxTopKMerge(c: Column, k: Int, capacity: Int): Column =
    ExpressionUtils.column(
      ApproxTopKMerge(ExpressionUtils.expression(c), k, capacity).toAggregateExpression())
}
