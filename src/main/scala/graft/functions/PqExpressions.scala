package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels as SINGLE codegen expressions.
  *
  * The compositional rendering ([[graft.operators.Similarity.pqEncode]]
  * originally, and the ADC lookup tables) expanded to m×ks per-centroid
  * `l2_distance` kernels — at m=8, ks=64 that is 512 expression nodes
  * each carrying a literal centroid array, twice (encode + LUT). The
  * DATA cost is unchanged either way, but Catalyst analysis + whole-
  * stage codegen of a ~1000-kernel projection costs seconds of driver
  * time per query (measured: the ivf-pq recall gate spent ~3.6 s
  * WARMED on a 2000-row corpus — nearly all plan compilation). Each
  * expression here is one compiled loop over a referenced flat
  * codebook: O(1) plan nodes regardless of m×ks.
  *
  * Bit-exactness contract: the per-centroid distance replicates
  * [[L2Distance]]'s exact arithmetic — interleaved dot/na/nb
  * accumulation in index order, then `sqrt(max(na + nb - 2·dot, 0))` —
  * and the LUT entry replicates the original `d * d` (sqrt then
  * square, NOT the raw squared sum), so codes and ADC scores are
  * bit-identical to the compositional form and the pinned similarity
  * oracles hold. Ties keep the FIRST minimal centroid (the
  * `array_position(arr, array_min(arr))` behavior).
  *
  * The flat codebook is s-major: centroid c of subspace s occupies
  * `[(s·ks + c)·dsub, …+dsub)`. A vector whose length ≠ m·dsub yields
  * NULL (the compositional form yielded a code array of nulls — both
  * mark a malformed row; this one is detectable with one IS NULL). */
abstract class PqCodebookExpression extends UnaryExpression {
  def flatCodebook: Array[Double]
  def m: Int
  def ks: Int
  def dsub: Int

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got $other")
  }

  protected def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** d(sub s of x, centroid c) — the exact L2Distance arithmetic. */
  protected final def dist(x: ArrayData, isFloat: Boolean, s: Int, c: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val xBase = s * dsub
    val cBase = (s * ks + c) * dsub
    var j = 0
    while (j < dsub) {
      val xv = if (isFloat) x.getFloat(xBase + j).toDouble else x.getDouble(xBase + j)
      val yv = flatCodebook(cBase + j)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      j += 1
    }
    math.sqrt(math.max(na + nb - 2.0 * dot, 0.0))
  }

  /** Shared codegen scaffold: subclasses provide the per-subspace
    * inner body given (cbVar, getter, out). */
  protected def genLoop(ctx: CodegenContext, a: String, get: String,
      cb: String): (String, String)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cb = ctx.addReferenceObj("pqCodebook", flatCodebook, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val (body, result) = genLoop(ctx, a, get, cb)
      s"""
        if ($a.numElements() != ${m * dsub}) {
          ${ev.isNull} = true;
        } else {
          $body
          ${ev.value} = $result;
        }
      """
    })
  }
}

/** pq_encode(vec) → ARRAY<INT> of m codebook indices (argmin per
  * subspace, first-tie). */
case class PqEncodeCodes(child: Expression, flatCodebook: Array[Double],
    m: Int, ks: Int, dsub: Int) extends PqCodebookExpression {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != m * dsub) return null
    val isFloat = elemIsFloat
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ks) {
        val d = dist(x, isFloat, s, c)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def genLoop(ctx: CodegenContext, a: String, get: String,
      cb: String): (String, String) = {
    val codes = ctx.freshName("codes")
    val s = ctx.freshName("s"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val d = ctx.freshName("d"); val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
    val body = s"""
      int[] $codes = new int[$m];
      for (int $s = 0; $s < $m; $s++) {
        int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
        for (int $c = 0; $c < $ks; $c++) {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $j = 0; $j < $dsub; $j++) {
            final double $xv = (double) $a.$get($s * $dsub + $j);
            final double $yv = $cb[($s * $ks + $c) * $dsub + $j];
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          final double $d = Math.sqrt(Math.max($na + $nb - 2.0 * $dot, 0.0));
          if ($d < $bestD) { $bestD = $d; $best = $c; }
        }
        $codes[$s] = $best;
      }
    """
    (body, s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** pq_adc_lut(qvec) → ARRAY<DOUBLE> of m·ks squared distances, flat
  * s-major: entry[s·ks + c] = d(qsub_s, centroid c)², with d computed
  * sqrt-then-squared exactly as the compositional LUT did. */
case class PqAdcLut(child: Expression, flatCodebook: Array[Double],
    m: Int, ks: Int, dsub: Int) extends PqCodebookExpression {
  override def prettyName: String = "pq_adc_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != m * dsub) return null
    val isFloat = elemIsFloat
    val lut = new Array[Double](m * ks)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ks) {
        val d = dist(x, isFloat, s, c)
        lut(s * ks + c) = d * d
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(lut)
  }

  override protected def genLoop(ctx: CodegenContext, a: String, get: String,
      cb: String): (String, String) = {
    val lut = ctx.freshName("lut")
    val s = ctx.freshName("s"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val d = ctx.freshName("d")
    val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
    val body = s"""
      double[] $lut = new double[${m * ks}];
      for (int $s = 0; $s < $m; $s++) {
        for (int $c = 0; $c < $ks; $c++) {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $j = 0; $j < $dsub; $j++) {
            final double $xv = (double) $a.$get($s * $dsub + $j);
            final double $yv = $cb[($s * $ks + $c) * $dsub + $j];
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          final double $d = Math.sqrt(Math.max($na + $nb - 2.0 * $dot, 0.0));
          $lut[$s * $ks + $c] = $d * $d;
        }
      }
    """
    (body, s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($lut)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Column-API entry points; codebooks(s)(c) = centroid c of subspace s
  * (every subspace the same ks — [[graft.operators.Similarity
  * .trainPqCodebooks]] pads degenerate ones). */
object PqFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  private def flatten(codebooks: Array[Array[Array[Double]]]): (Array[Double], Int, Int, Int) = {
    val m = codebooks.length
    require(m > 0, "pq: empty codebooks")
    val ks = codebooks(0).length
    val dsub = codebooks(0)(0).length
    require(codebooks.forall(_.length == ks) &&
      codebooks.forall(_.forall(_.length == dsub)),
      "pq: ragged codebooks (every subspace needs the same ks and dsub)")
    val flat = new Array[Double](m * ks * dsub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ks) {
        System.arraycopy(codebooks(s)(c), 0, flat, (s * ks + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    (flat, m, ks, dsub)
  }

  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val (flat, m, ks, dsub) = flatten(codebooks)
    column(PqEncodeCodes(expression(vec), flat, m, ks, dsub))
  }

  def pq_adc_lut(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val (flat, m, ks, dsub) = flatten(codebooks)
    column(PqAdcLut(expression(vec), flat, m, ks, dsub))
  }
}
