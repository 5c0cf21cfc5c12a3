package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Polygon geometry — the st_polygon / st_contains pair.
  *
  * Reference: `be/src/exprs/geo_functions.cpp` (st_polygon parses WKT,
  * st_contains point-in-shape). The polygon is carried as a
  * struct(xs ARRAY<DOUBLE>, ys ARRAY<DOUBLE>) column — a plain nested
  * type, so it broadcasts/shuffles like any other column. Containment
  * is the standard even-odd ray cast: O(vertices) per row, scan-side,
  * no shuffle. Points exactly on an edge are boundary-undefined (same
  * caveat as the reference's float geometry).
  */
object GeoTypes {
  val polygonType: StructType = StructType(Seq(
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false))))
  // distinct field names discriminate the shape for StAsText
  val lineType: StructType = StructType(Seq(
    StructField("lxs", ArrayType(DoubleType, containsNull = false)),
    StructField("lys", ArrayType(DoubleType, containsNull = false))))
  val circleType: StructType = StructType(Seq(
    StructField("cx", DoubleType), StructField("cy", DoubleType),
    StructField("cr", DoubleType)))
}

/** st_linefromtext / st_linestringfromtext ('LINESTRING (x y, x y)')
  * → line struct (reference `be/src/geo/geo_types.cpp:326`
  * GeoLine::as_wkt for the format). */
case class StLine(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = GeoTypes.lineType
  override def nullable: Boolean = true
  override def prettyName: String = "st_linefromtext"
  override def nullSafeEval(v: Any): Any = try {
    val inner = v.toString.trim
      .replaceAll("(?i)^LINESTRING\\s*\\(", "").replaceAll("\\)$", "")
    val pts = inner.split(",").map(_.trim.split("\\s+"))
    if (pts.length < 2 || pts.exists(_.length < 2)) return null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new GenericArrayData(pts.map(_(0).toDouble)),
      new GenericArrayData(pts.map(_(1).toDouble))))
  } catch { case _: NumberFormatException => null }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_circle(lng, lat, radius) → circle struct (reference
  * `be/src/geo/geo_types.cpp:499` GeoCircle::as_wkt). */
case class StCircle(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = GeoTypes.circleType
  override def nullable: Boolean = true
  override def prettyName: String = "st_circle"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      vs.map(v => Double.box(v.asInstanceOf[Number].doubleValue())).toArray[Any])
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
}

/** st_polygon('POLYGON ((x y, x y, ...))') → polygon struct. */
case class StPolygon(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = GeoTypes.polygonType
  override def nullable: Boolean = true // null on malformed WKT
  override def prettyName: String = "st_polygon"

  override def nullSafeEval(v: Any): Any = try {
    val wkt = v.toString.trim
    val inner = wkt
      .replaceAll("(?i)^POLYGON\\s*\\(\\(", "")
      .replaceAll("\\)\\)$", "")
    val pts = inner.split(",").map(_.trim.split("\\s+"))
    if (pts.exists(_.length < 2)) return null
    val xs = pts.map(_(0).toDouble)
    val ys = pts.map(_(1).toDouble)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(xs), new GenericArrayData(ys)))
  } catch {
    // MySQL-lenient surface: malformed geometry text → NULL, not a crash
    case _: NumberFormatException => null
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_astext / st_aswkt: WKT of a point or polygon struct. */
case class StAsText(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "st_astext"

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val text = child.dataType match {
      case s: StructType if s.fieldNames.sameElements(Array("xs", "ys")) =>
        val xs = row.getArray(0).toDoubleArray()
        val ys = row.getArray(1).toDoubleArray()
        xs.zip(ys).map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }
          .mkString("POLYGON ((", ", ", "))")
      case s: StructType if s.fieldNames.sameElements(Array("lxs", "lys")) =>
        val xs = row.getArray(0).toDoubleArray()
        val ys = row.getArray(1).toDoubleArray()
        xs.zip(ys).map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }
          .mkString("LINESTRING (", ", ", ")")
      case s: StructType if s.fieldNames.sameElements(Array("cx", "cy", "cr")) =>
        s"CIRCLE ((${fmt(row.getDouble(0))} ${fmt(row.getDouble(1))}), ${fmt(row.getDouble(2))})"
      case s: StructType if s.length == 2 =>
        val x = s.fields(0).dataType match {
          case DoubleType => row.getDouble(0)
          case _ => row.get(0, s.fields(0).dataType).asInstanceOf[Number].doubleValue()
        }
        val y = s.fields(1).dataType match {
          case DoubleType => row.getDouble(1)
          case _ => row.get(1, s.fields(1).dataType).asInstanceOf[Number].doubleValue()
        }
        s"POINT (${fmt(x)} ${fmt(y)})"
      case other => throw new IllegalArgumentException(s"st_astext: $other")
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(text)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** array_sum / array_avg over numeric arrays (reference
  * `be/src/exprs/array_functions.cpp` — Spark has array_min/max/size
  * builtins but no sum/avg short of an interpreted HOF). Null
  * elements are skipped, like the reference kernels. */
case class ArraySumAvg(child: Expression, isAvg: Boolean)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = if (isAvg) "array_avg" else "array_sum"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val elem = child.dataType.asInstanceOf[ArrayType].elementType
    var sum = 0.0
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        sum += (elem match {
          case FloatType => arr.getFloat(i).toDouble
          case DoubleType => arr.getDouble(i)
          case IntegerType => arr.getInt(i).toDouble
          case LongType => arr.getLong(i).toDouble
          case ShortType => arr.getShort(i).toDouble
          case ByteType => arr.getByte(i).toDouble
          case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
          case other => throw new IllegalArgumentException(s"$prettyName: $other")
        })
        n += 1
      }
      i += 1
    }
    if (isAvg) { if (n == 0) null else sum / n } else sum
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_contains(polygon, point) → even-odd point-in-polygon. */
case class StContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_contains"

  override def nullSafeEval(poly: Any, point: Any): Any = {
    val p = poly.asInstanceOf[InternalRow]
    val xs = p.getArray(0).toDoubleArray()
    val ys = p.getArray(1).toDoubleArray()
    val pt = point.asInstanceOf[InternalRow]
    val x = pt.getDouble(0)
    val y = pt.getDouble(1)
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      if ((ys(i) > y) != (ys(j) > y) &&
          x < (xs(j) - xs(i)) * (y - ys(i)) / (ys(j) - ys(i)) + xs(i)) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
