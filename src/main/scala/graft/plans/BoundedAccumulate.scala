package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Double-bounded running accumulation:
  * `b_i = clamp(b_{i-1} + delta_i, lo, hi)` per key, in event order —
  * capped inventory levels, token buckets, rate limiters, bounded
  * battery/credit models.
  *
  * WHY a custom physical operator (SURVEY §7.3 decision ladder, rung
  * c): with only a LOWER bound the recurrence has a closed form over
  * prefix sums (see the `ts_clamped_balance` gate — two windows). With
  * BOTH bounds the clamp at each step destroys linearity: no window
  * frame, aggregate, or expression composition computes it — the
  * reference evaluates this class of stateful scan inside its
  * analytic-node loop. Rung (d) `mapPartitions` would work but throws
  * away the planner contract; this node instead DECLARES
  * `requiredChildDistribution` (cluster by key) and
  * `requiredChildOrdering` (key, then event order), so Catalyst plans
  * the exchange + sort exactly like it does for Window or
  * SortMergeJoin — AQE still sizes the shuffle, and the operator
  * itself is a zero-allocation per-partition scan. At 100 TB the cost
  * is ONE shuffle on the key — identical to the window-based
  * lower-clamp plan.
  *
  * The full ladder: logical node → strategy (installed via
  * `experimental.extraStrategies` in Session.prepare) → exec node →
  * the `boundedRunningSum` DataFrame API below.
  */
case class BoundedAccumulate(
    keys: Seq[Attribute],
    ordering: Seq[SortOrder],
    delta: Expression,
    lo: Double,
    hi: Double,
    balance: AttributeReference,
    child: LogicalPlan,
    kernel: String = "clamp") extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ balance
  // balance is GENERATED here, not derived from the child — without
  // this CheckAnalysis flags it as a missing attribute
  override def producedAttributes: AttributeSet = AttributeSet(balance)
  override protected def withNewChildInternal(c: LogicalPlan): BoundedAccumulate =
    copy(child = c)
}

object BoundedAccumulateStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case b: BoundedAccumulate =>
      BoundedAccumulateExec(b.keys, b.ordering, b.delta, b.lo, b.hi,
        b.balance, planLater(b.child), b.kernel) :: Nil
    case _ => Nil
  }
}

case class BoundedAccumulateExec(
    keys: Seq[Attribute],
    ordering: Seq[SortOrder],
    delta: Expression,
    lo: Double,
    hi: Double,
    balance: AttributeReference,
    child: SparkPlan,
    kernel: String = "clamp") extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ balance
  override def producedAttributes: AttributeSet = AttributeSet(balance)

  // one shuffle on the key, then a per-partition sorted scan — the
  // same physical contract Window declares
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ ordering)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val deltaExpr = delta
    val (lb, ub) = (lo, hi)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val boundDelta = BindReferences.bindReference(deltaExpr, childOutput)
      val outProj = UnsafeProjection.create(
        childOutput :+ BoundReference(childOutput.length, DoubleType, nullable = false),
        childOutput :+ AttributeReference("__bal", DoubleType, nullable = false)())
      val joined = new JoinedRow
      val balRow = new SpecificInternalRow(Seq(DoubleType))
      val kcode = kernel match {
        case "clamp" => 0; case "ewma" => 1; case "holt" => 2
        case other => throw new IllegalArgumentException(s"kernel: $other")
      }
      var curKey: UnsafeRow = null
      var bal = 0.0
      var trend = 0.0
      var fresh = true
      iter.map { row =>
        val k = keyProj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy(); bal = 0.0; trend = 0.0; fresh = true
        }
        val d = boundDelta.eval(row) match {
          case null => 0.0
          case n: java.lang.Number => n.doubleValue()
        }
        // clamp: b = min(hi, max(lo, b + x))
        // ewma (alpha = lo): s = x first, then s = alpha*x + (1-alpha)*s
        // holt (alpha = lo, beta = hi): level+trend double smoothing
        kcode match {
          case 0 => bal = math.min(ub, math.max(lb, bal + d))
          case 1 => bal = if (fresh) d else lb * d + (1.0 - lb) * bal
          case 2 =>
            if (fresh) { bal = d; trend = 0.0 }
            else {
              val lNew = lb * d + (1.0 - lb) * (bal + trend)
              trend = ub * (lNew - bal) + (1.0 - ub) * trend
              bal = lNew
            }
        }
        fresh = false
        balRow.setDouble(0, bal)
        outProj(joined(row, balRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): BoundedAccumulateExec =
    copy(child = c)
}

object BoundedAccumulate {
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraStrategies
    if (!existing.contains(BoundedAccumulateStrategy))
      spark.experimental.extraStrategies = existing :+ BoundedAccumulateStrategy
  }

  /** DataFrame-facing API: append a `balanceCol` column holding the
    * clamped running sum of `deltaCol` per `keyCols` group in
    * `orderCols` order. */
  def boundedRunningSum(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], deltaCol: String,
      lo: Double, hi: Double, balanceCol: String = "balance"): DataFrame = {
    require(lo <= hi, "lo must be <= hi")
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val node = BoundedAccumulate(
      keyCols.map(attr),
      orderCols.map(c => SortOrder(attr(c), Ascending)),
      attr(deltaCol),
      lo, hi,
      AttributeReference(balanceCol, DoubleType, nullable = false)(),
      child)
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }

  /** Exponentially-weighted moving average per key in event order:
    * `s_1 = x_1; s_i = alpha*x_i + (1-alpha)*s_{i-1}` — the same
    * no-closed-form recurrence class as the clamp (powers of (1-α)
    * over an unbounded frame underflow/explode numerically), on the
    * same physical operator. */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      xCol: String, alpha: Double, outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val node = BoundedAccumulate(
      keyCols.map(attr),
      orderCols.map(c => SortOrder(attr(c), Ascending)),
      attr(xCol),
      alpha, 0.0,
      AttributeReference(outCol, DoubleType, nullable = false)(),
      child, kernel = "ewma")
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }

  /** Holt linear-trend (double-exponential) smoothing per key:
    * `l_1 = x_1, b_1 = 0;
    *  l_i = alpha*x_i + (1-alpha)*(l_{i-1} + b_{i-1});
    *  b_i = beta*(l_i - l_{i-1}) + (1-beta)*b_{i-1}` — emits the
    * smoothed level. Two doubles of per-key state on the same exec. */
  def holt(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      xCol: String, alpha: Double, beta: Double,
      outCol: String = "level"): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      "alpha in (0,1], beta in [0,1]")
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val node = BoundedAccumulate(
      keyCols.map(attr),
      orderCols.map(c => SortOrder(attr(c), Ascending)),
      attr(xCol),
      alpha, beta,
      AttributeReference(outCol, DoubleType, nullable = false)(),
      child, kernel = "holt")
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node)
  }
}
