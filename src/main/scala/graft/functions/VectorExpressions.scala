package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector distance kernels over ARRAY<FLOAT>/ARRAY<DOUBLE>.
  *
  * The reference registers cosine_similarity / l2_distance as native
  * column-at-a-time kernels (`gensrc/script/functions.py:62-72`,
  * `be/src/exprs/math_functions.cpp`). Here each is a Catalyst
  * expression with `doGenCode`, so the dot-product loop fuses into
  * whole-stage codegen — one pass, no boxing, no UDF serialization.
  * This is the hot inner loop of similarity search at 100 TB scale
  * (SURVEY.md §7.2 M6), which is why it is a native expression rather
  * than `aggregate(zip_with(...))` composition.
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Combine (dot, norm_a^2, norm_b^2) into the result; NaN → null. */
  protected def combine(dot: Double, na: Double, nb: Double): Double
  /** Java source combining doubles `dot`,`na`,`nb` into a double expr. */
  protected def combineCode(dot: String, na: String, nb: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    val lf = elemIsFloat(left.dataType)
    val rf = elemIsFloat(right.dataType)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val r = combine(dot, na, nb)
    if (java.lang.Double.isNaN(r)) null else java.lang.Double.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left.dataType)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right.dataType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements() || $n == 0) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            final double $x = (double) $a.$lGet($i);
            final double $y = (double) $b.$rGet($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = ${combineCode(dot, na, nb)};
          if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
        }
      """
    })
  }
}

/** cosine_similarity(a, b) = dot(a,b) / (|a| * |b|); null on dim mismatch. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def combine(dot: Double, na: Double, nb: Double): Double =
    dot / math.sqrt(na * nb)
  override protected def combineCode(dot: String, na: String, nb: String): String =
    s"$dot / Math.sqrt($na * $nb)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2_distance(a, b) = sqrt(sum((a_i - b_i)^2)). */
case class L2Distance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "l2_distance"
  override protected def combine(dot: Double, na: Double, nb: Double): Double =
    math.sqrt(math.max(na + nb - 2.0 * dot, 0.0))
  override protected def combineCode(dot: String, na: String, nb: String): String =
    s"Math.sqrt(Math.max($na + $nb - 2.0 * $dot, 0.0))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot_product(a, b) = sum(a_i * b_i). */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"
  override protected def combine(dot: Double, na: Double, nb: Double): Double = dot
  override protected def combineCode(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Column-API entry points for the vector kernels. */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def cosine_similarity(a: Column, b: Column): Column = column(CosineSimilarity(expression(a), expression(b)))
  def l2_distance(a: Column, b: Column): Column = column(L2Distance(expression(a), expression(b)))
  def dot_product(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
}
