package graft.functions.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.roaringbitmap.longlong.Roaring64NavigableMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bitmap type + aggregates over 64-bit Roaring bitmaps.
  *
  * Reference: `be/src/types/bitmap_value.h:67` (BitmapValue — Roaring
  * under the hood) and `be/src/exprs/bitmap_functions.cpp` /
  * `be/src/exprs/agg/bitmap_union.h` (bitmap_union,
  * bitmap_union_count, bitmap_count, bitmap_and/or/xor,
  * bitmap_to_array). The bitmap is carried as a BinaryType column
  * (self-defined portable serialization), the same storage pattern the
  * reference uses for its OBJECT/BITMAP columns.
  *
  * Scale: bitmaps are the classic exact-distinct structure for AGG
  * tables — mergeable partial states means Spark's two-phase agg
  * applies; per-group memory is compressed-roaring sized.
  */
object BitmapCodec {
  def serialize(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    bm.serialize(out)
    out.flush()
    bos.toByteArray
  }
  def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bm = new Roaring64NavigableMap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }
}

/** bitmap_union(to_bitmap(x)) over longs → serialized bitmap (binary). */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_union"

  override def createAggregationBuffer(): Roaring64NavigableMap = new Roaring64NavigableMap()

  override def update(buf: Roaring64NavigableMap, input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    if (v != null) {
      child.dataType match {
        case BinaryType => buf.or(BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]]))
        case _ => buf.addLong(v.asInstanceOf[Number].longValue())
      }
    }
    buf
  }

  override def merge(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = {
    a.or(b); a
  }

  override def eval(buf: Roaring64NavigableMap): Any = BitmapCodec.serialize(buf)
  override def serialize(buf: Roaring64NavigableMap): Array[Byte] = BitmapCodec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = BitmapCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** to_bitmap(long) → single-element bitmap (reference
  * `be/src/exprs/bitmap_functions.cpp` to_bitmap). */
case class ToBitmap(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "to_bitmap"
  override def nullSafeEval(v: Any): Any = {
    val bm = new Roaring64NavigableMap()
    bm.addLong(v.asInstanceOf[Number].longValue())
    BitmapCodec.serialize(bm)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** bitmap_count(bitmap_binary) → exact cardinality. */
case class BitmapCount(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_count"
  override def nullSafeEval(v: Any): Any =
    BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]]).getLongCardinality
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** bitmap_to_array(bitmap_binary) → sorted array<long>. */
case class BitmapToArray(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_to_array"
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]]).toArray)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

abstract class BitmapBinaryOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  protected def op(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = BitmapCodec.deserialize(l.asInstanceOf[Array[Byte]])
    val b = BitmapCodec.deserialize(r.asInstanceOf[Array[Byte]])
    BitmapCodec.serialize(op(a, b))
  }
}

case class BitmapAnd(left: Expression, right: Expression) extends BitmapBinaryOp {
  override def prettyName: String = "bitmap_and"
  override protected def op(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = { a.and(b); a }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
case class BitmapOr(left: Expression, right: Expression) extends BitmapBinaryOp {
  override def prettyName: String = "bitmap_or"
  override protected def op(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = { a.or(b); a }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
case class BitmapXor(left: Expression, right: Expression) extends BitmapBinaryOp {
  override def prettyName: String = "bitmap_xor"
  override protected def op(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = { a.xor(b); a }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
