package graft.functions.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** min_n / max_n — the n smallest / largest values of a group as a
  * sorted array (min_n ascending, max_n descending), computed with a
  * BOUNDED n-element heap per group.
  *
  * Reference: `be/src/exprs/agg/minmax_n.h` (MinMaxN states).
  *
  * Scale: the naive formulation `slice(array_sort(collect_list(x)), 1, n)`
  * buffers every group value — O(group size) memory per group, a spill
  * bomb on 100 TB facts. This keeps exactly n values per group and is
  * mergeable, so Spark's two-phase hash aggregation applies: partials
  * of size n combine map-side before the shuffle.
  */
case class MinMaxNAgg(
    child: Expression,
    n: Int,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  require(n > 0, "min_n/max_n: n must be a positive literal")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = if (isMax) "max_n" else "min_n"

  @transient private lazy val baseOrd: Ordering[Any] =
    PhysicalDataType.ordering(child.dataType).asInstanceOf[Ordering[Any]]
  // queue head = the evictable (worst kept) element: largest kept for
  // min_n, smallest kept for max_n
  @transient private lazy val queueOrd: Ordering[Any] =
    if (isMax) baseOrd.reverse else baseOrd

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](queueOrd)

  private def offer(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < n) buf.enqueue(v)
    else if (queueOrd.compare(v, buf.head) < 0) { buf.dequeue(); buf.enqueue(v) }

  override def update(buf: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(a: mutable.PriorityQueue[Any], b: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b.foreach(offer(a, _))
    a
  }

  // sorted(ord) is ascending w.r.t. ord: base order for min_n,
  // reversed base (= descending) for max_n
  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(queueOrd))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeObject)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val count = in.readInt()
    var i = 0
    while (i < count) { buf.enqueue(in.readObject()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinMaxNAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinMaxNAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
