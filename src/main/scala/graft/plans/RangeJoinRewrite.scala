package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DoubleType, LongType, NumericType, TimestampType}

/** Automatic range-join derivation (reference:
  * `fe/fe-core/.../DeriveRangeJoinPredicateRule.java`; same idea as
  * Databricks' range-join optimization): an INNER join whose only
  * join condition is `p >= lo AND p <= hi` (point from one side,
  * interval from the other) plans as a BroadcastNestedLoopJoin —
  * every point probes every interval, O(|P|·|I|). This rule rewrites
  * it into the binned equi join of `operators/RangeJoin`: quantize
  * the axis (bin = `spark.graft.rangeJoin.binSize`), replicate each
  * interval into the bins it covers (Generate/Sequence), join on the
  * bin id — shuffled, AQE-eligible, codegen'd — and keep the original
  * range predicate as the residual filter. A point matches an
  * interval only in the point's own bin, so no duplicates and no
  * dedup pass.
  *
  * Opt-in via `spark.graft.rangeJoin.enabled` (the reference gates
  * its rule behind the session too). The rewrite skips joins that
  * already carry an equi conjunct — those hash-join fine without
  * help, and the guard also makes the rule idempotent (the rewritten
  * join contains a bin equality).
  */
object RangeJoinRewrite {
  val EnabledKey = "spark.graft.rangeJoin.enabled"
  val BinKey = "spark.graft.rangeJoin.binSize"
  /** Hard cap on bins one interval may replicate into. One open-ended
    * interval (sentinel hi) or a mis-set binSize would otherwise
    * explode a single row into millions of bin rows — a hard failure
    * at Sequence's array limit or a shuffle blow-up. The interval side
    * carries a runtime assert (the span is data-dependent, invisible
    * at plan time) that fails FAST with a message naming the confs. */
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"

  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[RangeJoinRule]))
      spark.experimental.extraOptimizations = existing :+ RangeJoinRule(spark)
  }
}

case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import RangeJoinRewrite._

  private def enabled: Boolean =
    spark.conf.getOption(EnabledKey).contains("true")
  private def binSize: Double =
    spark.conf.getOption(BinKey).map(_.toDouble).getOrElse(1000.0)
  private def maxBins: Long =
    spark.conf.getOption(MaxBinsKey).map(_.toLong).getOrElse(100000L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint).getOrElse(j)
    }
  }

  private def numeric(e: Expression): Boolean = e.dataType match {
    case _: NumericType | DateType | TimestampType => true
    case _ => false
  }

  /** Binnable double view of the axis: dates → epoch days, timestamps
    * → epoch seconds (binSize then reads in days/seconds), numerics →
    * plain double. */
  private def asAxis(e: Expression): Expression = e.dataType match {
    case DateType => Cast(UnixDate(e), DoubleType)
    case TimestampType => Cast(e, DoubleType)
    case _ => Cast(e, DoubleType)
  }

  private def fromOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** Find (point, lo, hi, pointOnLeft) in the conjuncts: a pair
    * `p >= lo` / `p <= hi` (any comparison spelling) with `p` bound to
    * one side and both bounds to the other. */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    // try each (pointSide, boundSide) assignment
    val sides = Seq((left, right, true), (right, left, false))
    for ((pSide, bSide, pLeft) <- sides) {
      val lowers = conjuncts.collect {
        case GreaterThanOrEqual(p, lo) if fromOnly(p, pSide) && fromOnly(lo, bSide) => (p, lo)
        case LessThanOrEqual(lo, p) if fromOnly(p, pSide) && fromOnly(lo, bSide) => (p, lo)
        case GreaterThan(p, lo) if fromOnly(p, pSide) && fromOnly(lo, bSide) => (p, lo)
        case LessThan(lo, p) if fromOnly(p, pSide) && fromOnly(lo, bSide) => (p, lo)
      }
      val uppers = conjuncts.collect {
        case LessThanOrEqual(p, hi) if fromOnly(p, pSide) && fromOnly(hi, bSide) => (p, hi)
        case GreaterThanOrEqual(hi, p) if fromOnly(p, pSide) && fromOnly(hi, bSide) => (p, hi)
        case LessThan(p, hi) if fromOnly(p, pSide) && fromOnly(hi, bSide) => (p, hi)
        case GreaterThan(hi, p) if fromOnly(p, pSide) && fromOnly(hi, bSide) => (p, hi)
      }
      for ((p, lo) <- lowers; (p2, hi) <- uppers
           if p.semanticEquals(p2) && numeric(p) && numeric(lo) && numeric(hi))
        return Some((p, lo, hi, pLeft))
    }
    None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def hasEquiKey(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = conjuncts.exists {
    case EqualTo(a, b) =>
      (fromOnly(a, left) && fromOnly(b, right)) ||
        (fromOnly(a, right) && fromOnly(b, left))
    case _ => false
  }

  private def bin(e: Expression): Expression =
    Floor(Divide(asAxis(e), Literal(binSize)))

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    if (hasEquiKey(conjuncts, left, right)) return None
    findRange(conjuncts, left, right).map { case (p, lo, hi, pointOnLeft) =>
      val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)

      // point side: project the single bin of p
      val pBin = Alias(bin(p), "__p_bin")()
      val pPlan = Project(pSide.output :+ pBin, pSide)

      // interval side: drop empty intervals, explode covered bins —
      // bounded by the per-interval bin cap (see MaxBinsKey scaladoc)
      val span = Subtract(bin(hi), bin(lo))
      val capMsg = s"range-join rewrite: an interval covers more than " +
        s"$maxBins bins at binSize=$binSize - raise $BinKey or " +
        s"$MaxBinsKey, or disable $EnabledKey for this query"
      // (assert_true is RuntimeReplaceable — injected post-analysis it
      // would never be replaced and codegen fails; build its expansion)
      val capGuard = IsNull(If(LessThanOrEqual(span, Literal(maxBins)),
        Literal(null, org.apache.spark.sql.types.NullType),
        new RaiseError(Literal(capMsg))))
      val nonEmpty = Filter(And(LessThanOrEqual(lo, hi), capGuard), iSide)
      // Sequence is TimeZoneAwareExpression — without an explicit zone
      // it stays unresolved and the optimizer's plan validation trips
      val gen = Explode(Sequence(bin(lo), bin(hi), Some(Literal(1L)))
        .withTimeZone(spark.sessionState.conf.sessionLocalTimeZone))
      val iBinAttr = AttributeReference("__i_bin", LongType, nullable = false)()
      val iPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(iBinAttr), child = nonEmpty)

      val (newLeft, newRight) =
        if (pointOnLeft) (pPlan, iPlan) else (iPlan, pPlan)
      val newCond = And(EqualTo(pBin.toAttribute, iBinAttr), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
