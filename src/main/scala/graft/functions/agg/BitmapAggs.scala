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

/** intersect_count(bitmap, filter_col, v1, v2, ...) — cardinality of
  * the intersection of the per-filter-value bitmap unions: "users who
  * did v1 AND v2 AND ..." in one pass (reference
  * `be/src/exprs/agg/intersect_count.h`, the audience-overlap kernel).
  *
  * Buffer = one bitmap per filter value; update ORs the row's bitmap
  * (or long) into every slot whose value matches the row's filter
  * column; eval ANDs the slots. Mergeable → two-phase agg applies.
  */
case class IntersectCountAgg(
    bitmap: Expression,
    filterCol: Expression,
    filterValues: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Roaring64NavigableMap]] {

  require(filterValues.nonEmpty && filterValues.forall(_.foldable),
    "intersect_count: filter values must be literals")

  override def children: Seq[Expression] = bitmap +: filterCol +: filterValues
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count"

  @transient private lazy val targets: Array[Any] =
    filterValues.map(_.eval(InternalRow.empty)).toArray

  override def createAggregationBuffer(): Array[Roaring64NavigableMap] =
    Array.fill(filterValues.size)(new Roaring64NavigableMap())

  override def update(buf: Array[Roaring64NavigableMap], input: InternalRow): Array[Roaring64NavigableMap] = {
    val fv = filterCol.eval(input)
    if (fv != null) {
      var i = 0
      while (i < targets.length) {
        if (targets(i) == fv) {
          val v = bitmap.eval(input)
          if (v != null) bitmap.dataType match {
            case BinaryType => buf(i).or(BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]]))
            case _ => buf(i).addLong(v.asInstanceOf[Number].longValue())
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Roaring64NavigableMap], b: Array[Roaring64NavigableMap]): Array[Roaring64NavigableMap] = {
    var i = 0
    while (i < a.length) { a(i).or(b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Roaring64NavigableMap]): Any = {
    val acc = BitmapCodec.deserialize(BitmapCodec.serialize(buf(0)))
    var i = 1
    while (i < buf.length) { acc.and(buf(i)); i += 1 }
    acc.getLongCardinality
  }

  override def serialize(buf: Array[Roaring64NavigableMap]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { bm =>
      val bytes = BitmapCodec.serialize(bm)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Roaring64NavigableMap] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt()) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      BitmapCodec.deserialize(b)
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): IntersectCountAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): IntersectCountAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(bitmap = newChildren(0), filterCol = newChildren(1), filterValues = newChildren.drop(2))
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

/** bitmap_min / bitmap_max → smallest/largest member, null if empty. */
case class BitmapExtreme(child: Expression, isMax: Boolean)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = if (isMax) "bitmap_max" else "bitmap_min"
  override def nullSafeEval(v: Any): Any = {
    val bm = BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]])
    if (bm.isEmpty) null else if (isMax) bm.getReverseLongIterator.next() else bm.getLongIterator.next()
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** bitmap_contains(bm, v). */
case class BitmapContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bitmap_contains"
  override def nullSafeEval(l: Any, r: Any): Any =
    BitmapCodec.deserialize(l.asInstanceOf[Array[Byte]])
      .contains(r.asInstanceOf[Number].longValue())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** bitmap_has_any(a, b) — non-empty intersection. */
case class BitmapHasAny(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bitmap_has_any"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = BitmapCodec.deserialize(l.asInstanceOf[Array[Byte]])
    a.and(BitmapCodec.deserialize(r.asInstanceOf[Array[Byte]]))
    !a.isEmpty
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sub_bitmap(bm, offset, len): `len` members starting at sorted
  * position `offset` (negative offset counts from the end), as a new
  * bitmap — reference bitmap_functions.cpp sub_bitmap. */
case class SubBitmap(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sub_bitmap"
  override def nullSafeEval(v: Any, off: Any, len: Any): Any = {
    val bm = BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]])
    val n = bm.getLongCardinality
    val offset0 = off.asInstanceOf[Number].longValue()
    val count = len.asInstanceOf[Number].longValue()
    val start = if (offset0 < 0) n + offset0 else offset0
    if (start < 0 || start >= n || count <= 0) return null
    val out = new Roaring64NavigableMap()
    val it = bm.getLongIterator
    var i = 0L
    while (it.hasNext && i < start + count) {
      val x = it.next()
      if (i >= start) out.addLong(x)
      i += 1
    }
    BitmapCodec.serialize(out)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
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
case class BitmapAndNot(left: Expression, right: Expression) extends BitmapBinaryOp {
  override def prettyName: String = "bitmap_andnot"
  override protected def op(a: Roaring64NavigableMap, b: Roaring64NavigableMap): Roaring64NavigableMap = { a.andNot(b); a }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
