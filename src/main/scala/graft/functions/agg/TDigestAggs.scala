package graft.functions.agg

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Storable/mergeable percentile state (t-digest).
  *
  * Reference: `be/src/types/tdigest.h:115`,
  * `be/src/exprs/agg/percentile_approx.h` — the PERCENTILE column type:
  * ingest folds values into a compact digest stored in an AGG table;
  * later queries merge digests (`percentile_union`) and extract
  * quantiles (`percentile_approx_raw`) WITHOUT rescanning raw data.
  *
  * Spark's builtin percentile/approx_percentile compute at query time
  * only — neither state is storable — so this is a genuine gap filled
  * with DataSketches' TDigestDouble behind a BinaryType column.
  *
  * Scale: digest size is O(k)=200 centroids regardless of input rows;
  * partials merge map-side (two-phase agg), and a 100 TB fact folds to
  * a KB-sized state per group.
  */
case class TDigestAgg(
    child: Expression,
    isUnion: Boolean,
    k: Short = 500,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = if (isUnion) "percentile_union" else "percentile_agg"

  override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k)

  override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) {
      if (isUnion) buf.merge(TDigestDouble.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      else {
        val d = child.dataType match {
          case _: DecimalType => v.asInstanceOf[Decimal].toDouble
          case _ => v.asInstanceOf[Number].doubleValue()
        }
        buf.update(d)
      }
    }
    buf
  }

  override def merge(a: TDigestDouble, b: TDigestDouble): TDigestDouble = { a.merge(b); a }

  override def eval(buf: TDigestDouble): Any = buf.toByteArray

  override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** percentile_approx_raw(state_binary, rank) → approximate quantile. */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on an empty digest
  override def prettyName: String = "percentile_approx_raw"
  override def nullSafeEval(state: Any, rank: Any): Any = {
    val td = TDigestDouble.heapify(Memory.wrap(state.asInstanceOf[Array[Byte]]))
    if (td.isEmpty) null
    else td.getQuantile(rank.asInstanceOf[Number].doubleValue())
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
