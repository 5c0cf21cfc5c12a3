package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Table pruning for cardinality-preserving joins (reference:
  * `docs/en/using_starrocks/accelerate-cardinality-preserving-joins.md`,
  * FE rule `RboTablePruner` family) — drop a joined table whose
  * columns are never used when the join cannot change the other
  * side's cardinality or duplication factor:
  *
  *  - `A LEFT JOIN B ON a.fk = b.pk` with `b.pk` declared UNIQUE:
  *    every A row survives exactly once whether or not it matches,
  *    so if no B column is referenced above, B is dead weight.
  *    (A filter on B only affects which rows match — still safe.)
  *  - `A JOIN B ON a.fk = b.pk` (inner) additionally needs the FK
  *    declared NOT NULL with referential integrity, so every A row
  *    matches exactly one B row; then the join is the identity on A.
  *
  * Constraints are DECLARED, not inferred — same contract as the
  * reference's `ALTER TABLE ... ADD CONSTRAINT` unique/foreign keys:
  * the optimizer trusts the catalog, and loads that violate it are
  * the user's bug. Names identify keys (this engine's catalog has
  * globally unique column names, e.g. `o_orderkey`).
  *
  * Like the reference (session var `enable_table_prune`, default
  * off), the rule is opt-in via `spark.graft.tablePrune.enabled` so
  * plans never change under a user who declared nothing.
  *
  * Scale shape: pruning REMOVES a shuffle/broadcast per eliminated
  * table — on a 100 TB fact query against a wide snowflake logical
  * view where only a few feature columns are selected, this is the
  * difference between N joins and the 1-2 that matter.
  *
  * Installed as a post-optimizer fixed-point batch
  * (`experimental.extraOptimizations`), after ColumnPruning has
  * shaped plans into Project/Aggregate-over-Join; the fixed point
  * cascades the prune down snowflake chains (part←lineitem→orders→
  * customer→nation→region collapses join by join).
  */
object TablePrune {
  val EnabledKey = "spark.graft.tablePrune.enabled"

  /** Columns declared UNIQUE within their table. */
  @volatile var uniqueKeys: Set[String] = Set(
    "r_regionkey", "n_nationkey", "c_custkey", "s_suppkey",
    "p_partkey", "o_orderkey")

  /** (fk, pk) pairs declared NOT NULL + referentially intact. */
  @volatile var integralFks: Set[(String, String)] = Set(
    "n_regionkey" -> "r_regionkey",
    "c_nationkey" -> "n_nationkey",
    "s_nationkey" -> "n_nationkey",
    "o_custkey" -> "c_custkey",
    "l_orderkey" -> "o_orderkey",
    "l_partkey" -> "p_partkey",
    "l_suppkey" -> "s_suppkey")

  def declareUnique(col: String): Unit = synchronized { uniqueKeys += col }
  def declareIntegralFk(fk: String, pk: String): Unit =
    synchronized { integralFks += (fk -> pk) }

  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[TablePruneRule]))
      spark.experimental.extraOptimizations = existing :+ TablePruneRule(spark)
  }
}

case class TablePruneRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import TablePrune._

  private def enabled: Boolean =
    spark.conf.getOption(EnabledKey).contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case p @ Project(_, j: Join) =>
        tryPrune(p.references, j).map(c => p.copy(child = c)).getOrElse(p)
      case a: Aggregate if a.child.isInstanceOf[Join] =>
        tryPrune(a.references, a.child.asInstanceOf[Join])
          .map(c => a.withNewChildren(Seq(c)).asInstanceOf[Aggregate]).getOrElse(a)
    }

  /** A plan whose scan output is row-for-row its relation: leaf, or
    * attribute-only Project / alias over one. Filters break inner
    * integrity but not left-outer safety — hence two predicates. One
    * filter IS integrity-safe for inner joins: `IsNotNull(pk)` on the
    * joined unique key itself (InferFiltersFromConstraints plants it
    * under every equi-join), because an integral FK only ever matches
    * non-null key values.
    */
  private def bare(p: LogicalPlan, pk: AttributeReference): Boolean = p match {
    case _: LeafNode => true
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => bare(c, pk)
    case SubqueryAlias(_, c) => bare(c, pk)
    case Filter(IsNotNull(a: AttributeReference), c) if a.semanticEquals(pk) => bare(c, pk)
    case _ => false
  }
  private def bareOrFiltered(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => bareOrFiltered(c)
    case SubqueryAlias(_, c) => bareOrFiltered(c)
    case Filter(_, c) => bareOrFiltered(c)
    case _ => false
  }

  private def tryPrune(refs: AttributeSet, j: Join): Option[LogicalPlan] = j match {
    case Join(l, r, jt, Some(EqualTo(x: AttributeReference, y: AttributeReference)), _) =>
      def orient(fkSide: LogicalPlan, pkSide: LogicalPlan): Option[(AttributeReference, AttributeReference)] =
        if (fkSide.outputSet.contains(x) && pkSide.outputSet.contains(y)) Some((x, y))
        else if (fkSide.outputSet.contains(y) && pkSide.outputSet.contains(x)) Some((y, x))
        else None

      def prunableDim(jt2: org.apache.spark.sql.catalyst.plans.JoinType,
          fk: AttributeReference, pk: AttributeReference, dim: LogicalPlan): Boolean =
        jt2 match {
          case LeftOuter => uniqueKeys.contains(pk.name) && bareOrFiltered(dim)
          case Inner => uniqueKeys.contains(pk.name) &&
            integralFks.contains(fk.name -> pk.name) && bare(dim, pk)
          case _ => false
        }

      if (refs.subsetOf(l.outputSet))
        orient(l, r).filter { case (fk, pk) => prunableDim(jt, fk, pk, r) }.map(_ => l)
      else if (jt == Inner && refs.subsetOf(r.outputSet))
        orient(r, l).filter { case (fk, pk) => prunableDim(Inner, fk, pk, l) }.map(_ => r)
      else None
    case _ => None
  }
}
