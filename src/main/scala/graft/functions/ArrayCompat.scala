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

/** array_sortby(arr, keys): arr reordered by ascending keys (the
  * reference's two-array form; ties keep first-seen order). */
case class ArraySortBy(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType
  override def nullable: Boolean = true // null on length mismatch
  override def prettyName: String = "array_sortby"
  override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val keys = r.asInstanceOf[ArrayData]
    if (arr.numElements() != keys.numElements()) return null
    val elemL = left.dataType.asInstanceOf[ArrayType].elementType
    val elemR = right.dataType.asInstanceOf[ArrayType].elementType
    val ord = org.apache.spark.sql.catalyst.types.PhysicalDataType.ordering(elemR)
      .asInstanceOf[Ordering[Any]]
    val nullsFirst = new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else ord.compare(a, b)
    }
    val idx = (0 until arr.numElements()).sortBy(i =>
      if (keys.isNullAt(i)) null else keys.get(i, elemR))(nullsFirst)
    new GenericArrayData(idx.map(i =>
      if (arr.isNullAt(i)) null else arr.get(i, elemL)).toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** ngram_search(haystack, needle, n): fraction of the needle's
  * character n-grams present in the haystack — the reference's fuzzy
  * match score in [0, 1] (`be/src/exprs/ngram.cpp`). */
case class NgramSearch(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_search"
  override def nullSafeEval(hay: Any, needle: Any, n: Any): Any = {
    val g = n.asInstanceOf[Number].intValue()
    if (g <= 0) return null
    val h = hay.toString
    val q = needle.toString
    if (q.length < g) return null
    val hayGrams = (0 to h.length - g).map(i => h.substring(i, i + g)).toSet
    val qGrams = (0 to q.length - g).map(i => q.substring(i, i + g))
    qGrams.count(hayGrams.contains).toDouble / qGrams.size
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
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
