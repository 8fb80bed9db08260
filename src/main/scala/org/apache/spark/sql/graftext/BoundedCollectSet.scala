/** Size-capped exact value-set aggregate for envelope planning.
  *
  * r19 optimization (guide §1.2 "fewer passes"): the key-envelope
  * planner needed the per-key exact value set ONLY when it is small
  * (≤ `spark.graft.envelope.maxInValues`), and guarded the unbounded
  * `collect_set` behind an `approx_count_distinct` pre-check — two
  * aggregation jobs per envelope. This aggregate collects the set and
  * gives up the moment it exceeds the cap (evaluating to NULL), so the
  * state per group is O(cap) regardless of input cardinality and the
  * whole envelope (min/max + null flags + exact sets) folds into ONE
  * job. Serialization mirrors Spark's own `Collect` (an UnsafeRow
  * around a single array column).
  *
  * Overflow invariant: the buffer stops growing at cap+1 elements;
  * any buffer larger than `cap` means "the true set is larger than
  * cap" (the (cap+1)-th distinct element is retained only as the
  * overflow witness), so merge stays exact for sets that fit and
  * NULL-definite for sets that do not. */
package org.apache.spark.sql.graftext

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

case class BoundedCollectSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]] {

  require(cap > 0, s"bounded_collect_set needs cap > 0, got $cap")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_collect_set"

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty[Any]

  override def update(buf: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    // NULLs are ignored (collect_set semantics); stop growing past the
    // overflow witness — membership alone never increases size
    if (v != null && buf.size <= cap) { buf += InternalRow.copyValue(v); () }
    buf
  }

  override def merge(buf: mutable.HashSet[Any], other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (it.hasNext && buf.size <= cap) { buf += it.next(); () }
    buf
  }

  override def eval(buf: mutable.HashSet[Any]): Any =
    if (buf.size > cap) null else new GenericArrayData(buf.toArray)

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] = {
    val array = new GenericArrayData(buf.toArray)
    projection.apply(InternalRow.apply(array)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, x: Any) => buf += x)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
