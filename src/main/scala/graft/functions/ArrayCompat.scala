package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Array kernels the reference ships that Spark lacks
  * (`be/src/exprs/array_functions.h`: ArrayCumSum, ArrayDifference,
  * array_contains_all). All single-pass scan-side scalars. */
private object ArrayNum {
  def toDouble(arr: ArrayData, elem: DataType, i: Int): Double = elem match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalArgumentException(s"numeric array expected, got $other")
  }
}

/** array_cum_sum([a, b, c]) = [a, a+b, a+b+c]; null elements propagate
  * null at their position but don't break the running sum. */
case class ArrayCumSum(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "array_cum_sum"
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val elem = child.dataType.asInstanceOf[ArrayType].elementType
    val out = new Array[Any](arr.numElements())
    var sum = 0.0
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) out(i) = null
      else { sum += ArrayNum.toDouble(arr, elem, i); out(i) = sum }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** array_difference([a, b, c]) = [0, b-a, c-b] (reference
  * ArrayDifference semantics: first element keeps a zero delta). */
case class ArrayDifference(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "array_difference"
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val elem = child.dataType.asInstanceOf[ArrayType].elementType
    val out = new Array[Any](arr.numElements())
    var prev = 0.0
    var prevNull = true
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) { out(i) = null; prevNull = true }
      else {
        val cur = ArrayNum.toDouble(arr, elem, i)
        out(i) = if (i == 0 || prevNull) 0.0 else cur - prev
        prev = cur
        prevNull = false
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** array_contains_all(haystack, needles). */
case class ArrayContainsAll(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "array_contains_all"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val hay = l.asInstanceOf[ArrayData]
    val needles = r.asInstanceOf[ArrayData]
    val elemL = left.dataType.asInstanceOf[ArrayType].elementType
    val elemR = right.dataType.asInstanceOf[ArrayType].elementType
    val haySet = (0 until hay.numElements())
      .filterNot(hay.isNullAt).map(hay.get(_, elemL)).toSet
    (0 until needles.numElements()).forall { i =>
      !needles.isNullAt(i) && haySet.contains(needles.get(i, elemR))
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
