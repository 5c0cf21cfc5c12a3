package graft.functions.agg

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** approx_top_k(item, k) → array<struct<item,count>> sorted by
  * (count desc, item asc).
  *
  * Reference: `be/src/exprs/agg/approx_top_k.h` (StarRocks
  * approx_top_k). Backed by the DataSketches frequent-items sketch
  * (same family the reference's DS aggregates use,
  * `be/src/exprs/agg/ds_hll_count_distinct.h` cousins): mergeable,
  * bounded memory (maxMapSize entries) — the property that makes the
  * aggregation shuffle-safe at 100 TB. Counts are exact while distinct
  * items <= maxMapSize/2 (no purges), approximate beyond.
  */
case class ApproxTopKAgg(
    child: Expression,
    k: Int,
    maxMapSize: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "approx_top_k"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType))))

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b); a
  }

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
      .map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, cnt) => (-cnt, item) }
      .take(k)
      .map { case (item, cnt) =>
        InternalRow(UTF8String.fromString(item), cnt)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def withNewMutableAggBufferOffset(offset: Int): ApproxTopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxTopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
