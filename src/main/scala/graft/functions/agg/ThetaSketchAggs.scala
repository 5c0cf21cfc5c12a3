package graft.functions.agg

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta sketches: approximate distinct counting WITH set algebra —
  * unlike HLL, theta sketches support intersection and difference, the
  * reason the reference ships them alongside HLL.
  *
  * Reference: `be/src/exprs/agg/ds_theta_count_distinct.h` (theta agg),
  * DataSketches theta family. Carried as BinaryType compact-sketch
  * columns, the same storage pattern as the bitmap/HLL aggregates here.
  *
  * Modes: "count" → long estimate; "sketch" → serialized compact sketch
  * (storable in an AGG table); "union" → re-merge stored sketches.
  * lgK=14 keeps the sketch in exact mode below 16384 retained entries
  * (the oracle-gated queries stay under that; error ≤1.6% beyond).
  */
case class ThetaSketchAgg(
    child: Expression,
    mode: String,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(Seq("count", "sketch", "union").contains(mode), s"theta mode: $mode")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = if (mode == "count") LongType else BinaryType
  override def prettyName: String = mode match {
    case "count" => "ds_theta_count_distinct"
    case "sketch" => "ds_theta_sketch_agg"
    case "union" => "ds_theta_union_agg"
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      if (mode == "union") buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      else child.dataType match {
        case StringType => buf.update(v.toString)
        case BinaryType => buf.update(v.asInstanceOf[Array[Byte]])
        case FloatType | DoubleType => buf.update(v.asInstanceOf[Number].doubleValue())
        case _: DecimalType => buf.update(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toString)
        case _ => buf.update(v.asInstanceOf[Number].longValue())
      }
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }

  override def eval(buf: Union): Any =
    if (mode == "count") Math.round(buf.getResult.getEstimate)
    else buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** ds_theta_estimate(sketch_binary) → rounded distinct estimate. */
case class ThetaEstimate(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "ds_theta_estimate"
  override def nullSafeEval(v: Any): Any =
    Math.round(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

abstract class ThetaBinaryOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  protected def op(a: org.apache.datasketches.theta.Sketch,
      b: org.apache.datasketches.theta.Sketch): org.apache.datasketches.theta.CompactSketch
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = Sketches.wrapSketch(Memory.wrap(l.asInstanceOf[Array[Byte]]))
    val b = Sketches.wrapSketch(Memory.wrap(r.asInstanceOf[Array[Byte]]))
    op(a, b).toByteArray
  }
}

case class ThetaUnionOp(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "ds_theta_union"
  override protected def op(a: org.apache.datasketches.theta.Sketch,
      b: org.apache.datasketches.theta.Sketch): org.apache.datasketches.theta.CompactSketch =
    // same lgK as the aggregates — the default (12) would truncate an
    // exact-mode pair of inputs into estimation mode
    SetOperation.builder().setLogNominalEntries(14).buildUnion().union(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

case class ThetaIntersectOp(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "ds_theta_intersect"
  override protected def op(a: org.apache.datasketches.theta.Sketch,
      b: org.apache.datasketches.theta.Sketch): org.apache.datasketches.theta.CompactSketch =
    SetOperation.builder().buildIntersection().intersect(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** A \ B — the op HLL fundamentally cannot express. */
case class ThetaDiffOp(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "ds_theta_diff"
  override protected def op(a: org.apache.datasketches.theta.Sketch,
      b: org.apache.datasketches.theta.Sketch): org.apache.datasketches.theta.CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
