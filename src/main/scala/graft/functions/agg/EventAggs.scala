package graft.functions.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** retention(array<boolean>) — funnel retention aggregate (reference
  * `be/src/exprs/agg/retention.h`): result[0] = any row satisfied
  * cond0; result[i] = (any row satisfied cond0) AND (any row satisfied
  * cond_i). The buffer is the elementwise-OR of the input arrays —
  * O(#conditions) per group, mergeable map-side, so the 100 TB case
  * shuffles a few booleans per user, not the event rows.
  */
case class RetentionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Boolean]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)
  override def prettyName: String = "retention"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Boolean] =
    mutable.ArrayBuffer.empty[Boolean]

  override def update(buf: mutable.ArrayBuffer[Boolean], input: InternalRow): mutable.ArrayBuffer[Boolean] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      while (buf.length < arr.numElements()) buf += false
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i) && arr.getBoolean(i)) buf(i) = true
        i += 1
      }
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[Boolean], b: mutable.ArrayBuffer[Boolean]): mutable.ArrayBuffer[Boolean] = {
    while (a.length < b.length) a += false
    var i = 0
    while (i < b.length) { if (b(i)) a(i) = true; i += 1 }
    a
  }

  override def eval(buf: mutable.ArrayBuffer[Boolean]): Any = {
    val first = buf.nonEmpty && buf(0)
    new GenericArrayData(buf.zipWithIndex.map {
      case (v, 0) => v
      case (v, _) => first && v
    }.toArray)
  }

  override def serialize(buf: mutable.ArrayBuffer[Boolean]): Array[Byte] =
    buf.map(b => if (b) 1.toByte else 0.toByte).toArray
  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Boolean] =
    mutable.ArrayBuffer.from(bytes.map(_ == 1.toByte))

  override def withNewMutableAggBufferOffset(offset: Int): RetentionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): RetentionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** sum_map(map<string, numeric>) — per-key sum of map values across
  * the group (reference `be/src/exprs/agg/sum_map.h` /
  * FunctionSet SUM_MAP). Buffer is one (key → running sum) hash per
  * group — mergeable partials, map-side combine; keys come out
  * sorted so results are deterministic.
  */
case class SumMapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, DoubleType, valueContainsNull = false)
  override def prettyName: String = "sum_map"

  private val valueType = child.dataType match {
    case MapType(StringType, vt, _) => vt
    case other => throw new IllegalArgumentException(
      s"sum_map expects map<string, numeric>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Double] =
    mutable.HashMap.empty[String, Double]

  override def update(buf: mutable.HashMap[String, Double], input: InternalRow): mutable.HashMap[String, Double] = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      val keys = m.keyArray(); val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        if (!vals.isNullAt(i)) {
          val k = keys.getUTF8String(i).toString
          val d = vals.get(i, valueType) match {
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case n: Number => n.doubleValue()
          }
          buf.update(k, buf.getOrElse(k, 0.0) + d)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Double], b: mutable.HashMap[String, Double]): mutable.HashMap[String, Double] = {
    b.foreach { case (k, d) => a.update(k, a.getOrElse(k, 0.0) + d) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Double]): Any = {
    val sorted = buf.toSeq.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(kv => UTF8String.fromString(kv._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, d) => out.writeUTF(k); out.writeDouble(d) }
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Double]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readDouble()); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): SumMapAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SumMapAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
