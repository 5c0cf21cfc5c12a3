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

/** bitmap_intersect: AND of the group's bitmaps (vs bitmap_union's OR)
  * — reference `be/src/exprs/agg/bitmap_intersect.h`. The buffer needs
  * a "not yet seeded" marker: AND-identity is the full set, which is
  * unrepresentable, so the first input seeds the accumulator. */
final class BitmapIntersectAcc(var bm: Roaring64NavigableMap, var seeded: Boolean)

case class BitmapIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapIntersectAcc] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_intersect"

  override def createAggregationBuffer(): BitmapIntersectAcc =
    new BitmapIntersectAcc(new Roaring64NavigableMap(), seeded = false)

  override def update(buf: BitmapIntersectAcc, input: InternalRow): BitmapIntersectAcc = {
    val v = child.eval(input)
    if (v != null) {
      val in = BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]])
      if (!buf.seeded) { buf.bm.or(in); buf.seeded = true }
      else buf.bm.and(in)
    }
    buf
  }

  override def merge(a: BitmapIntersectAcc, b: BitmapIntersectAcc): BitmapIntersectAcc =
    if (!b.seeded) a
    else if (!a.seeded) b
    else { a.bm.and(b.bm); a }

  override def eval(buf: BitmapIntersectAcc): Any = BitmapCodec.serialize(buf.bm)

  override def serialize(buf: BitmapIntersectAcc): Array[Byte] = {
    val bytes = BitmapCodec.serialize(buf.bm)
    val out = new Array[Byte](bytes.length + 1)
    out(0) = if (buf.seeded) 1 else 0
    System.arraycopy(bytes, 0, out, 1, bytes.length)
    out
  }
  override def deserialize(bytes: Array[Byte]): BitmapIntersectAcc =
    new BitmapIntersectAcc(
      BitmapCodec.deserialize(java.util.Arrays.copyOfRange(bytes, 1, bytes.length)),
      bytes(0) == 1)

  override def withNewMutableAggBufferOffset(offset: Int): BitmapIntersectAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapIntersectAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** array_to_bitmap(array<integral>) → bitmap. */
case class ArrayToBitmap(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "array_to_bitmap"
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val elem = child.dataType.asInstanceOf[ArrayType].elementType
    val bm = new Roaring64NavigableMap()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) bm.addLong(elem match {
        case LongType => arr.getLong(i)
        case IntegerType => arr.getInt(i).toLong
        case ShortType => arr.getShort(i).toLong
        case other => throw new IllegalArgumentException(s"array_to_bitmap: $other")
      })
      i += 1
    }
    BitmapCodec.serialize(bm)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** bitmap_from_string('1,3,5') / bitmap_to_string(bm) — reference
  * bitmap_functions.cpp text round-trip. */
case class BitmapFromString(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bitmap_from_string"
  override def nullSafeEval(v: Any): Any = {
    val s = v.toString.trim
    val bm = new Roaring64NavigableMap()
    if (s.nonEmpty) {
      try s.split(",").foreach(t => bm.addLong(t.trim.toLong))
      catch { case _: NumberFormatException => return null }
    }
    BitmapCodec.serialize(bm)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class BitmapToString(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "bitmap_to_string"
  override def nullSafeEval(v: Any): Any = {
    val bm = BitmapCodec.deserialize(v.asInstanceOf[Array[Byte]])
    val sb = new StringBuilder
    val it = bm.getLongIterator
    while (it.hasNext) { if (sb.nonEmpty) sb.append(','); sb.append(it.next()) }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** bitmap_remove(bm, v). */
case class BitmapRemove(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_remove"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val bm = BitmapCodec.deserialize(l.asInstanceOf[Array[Byte]])
    bm.removeLong(r.asInstanceOf[Number].longValue())
    BitmapCodec.serialize(bm)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
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
  override def nullable: Boolean = true // null on out-of-range offset/len
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
