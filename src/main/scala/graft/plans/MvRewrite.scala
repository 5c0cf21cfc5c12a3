package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view auto-rewrite.
  *
  * Reference: transparent MV rewrite
  * (`fe/fe-core/.../sql/optimizer/rule/transformation/materialization/`,
  * `MvRewritePreprocessor.java` — SURVEY.md §4.1 last row, deferred
  * there as "needs custom Catalyst rule"). This is that rule, scoped
  * to exact-semantics matches: when any subtree of a query plan
  * computes the same result as a registered MV definition
  * (`LogicalPlan.sameResult`, i.e. canonicalized-plan equality), the
  * subtree is replaced by a scan of the materialized parquet, with a
  * Project restoring the original output attribute ids.
  *
  * Scale rationale: at 100 TB the win is not planning cleverness but
  * not re-scanning the fact table — a matching dashboard query hits
  * the MV's pre-aggregated parquet (typically 1e3–1e6× smaller).
  * Roll-up rewrites (query groups coarser than the MV) are future
  * work; exact matches are the common dashboard/repeat-query case.
  */
object MvRewrite {

  /** name → (optimized definition plan, analyzed scan of the
    * materialization). The scan is resolved at register time so the
    * rule never lists files mid-optimization (and a refresh must
    * re-register, keeping the file index current). */
  private val registry = TrieMap.empty[String, (LogicalPlan, LogicalPlan)]

  /** Register an MV: materialize `definition` to `path` (overwrite)
    * and remember its optimized plan for rewriting.
    *
    * Re-registration drops the old entry FIRST — otherwise the
    * definition's own refresh write would be rewritten to read from
    * the very MV it is overwriting (self-reference: a refresh cycle
    * and a read-while-overwrite error). Pass a freshly built
    * DataFrame, not one whose QueryExecution already ran. */
  def register(spark: SparkSession, name: String, definition: DataFrame, path: String): Unit = {
    registry.remove(name)
    definition.write.mode("overwrite").parquet(path)
    registry.put(name,
      (definition.queryExecution.optimizedPlan,
        spark.read.parquet(path).queryExecution.analyzed))
  }

  def deregister(name: String): Unit = registry.remove(name)
  def clear(): Unit = registry.clear()
  def registered: Seq[String] = registry.keys.toSeq

  /** The optimizer rule. Installed by [[install]] (idempotent). */
  final class Rewrite(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformDown {
        case sub if !sub.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode] =>
          registry.values.flatMap { case (mvPlan, scan0) =>
            // a FRESH scan instance (new exprIds) per substitution —
            // substituting the one cached plan at two match sites
            // (self-join/union over the MV) would duplicate exprIds
            // across two leaves of one optimized plan
            val scan = freshInstance(scan0)
            exactMatch(sub, mvPlan, scan)
              .orElse(prunedAggregateMatch(sub, mvPlan, scan))
              .orElse(rollupMatch(sub, mvPlan, scan))
          }.headOption.getOrElse(sub)
      }
    }

    private def freshInstance(scan: LogicalPlan): LogicalPlan = scan.transform {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    }

    /** Whole-subtree equality (`sameResult`): replace with the scan,
      * mapping attributes positionally (parquet column order is the
      * definition's output order). */
    private def exactMatch(sub: LogicalPlan, mvPlan: LogicalPlan,
        scan: LogicalPlan): Option[LogicalPlan] =
      if (sub.sameResult(mvPlan))
        Some(Project(sub.output.zip(scan.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId): NamedExpression
        }, scan))
      else None

    /** Containment after column pruning: the optimizer prunes unused
      * MV outputs from a consuming query's inner Aggregate, breaking
      * exact equality. Match when the subtree is an Aggregate with the
      * SAME child and grouping as the MV definition but a SUBSET of
      * its output expressions, and project just those MV columns. */
    private def prunedAggregateMatch(sub: LogicalPlan, mvPlan: LogicalPlan,
        scan: LogicalPlan): Option[LogicalPlan] = (sub, mvPlan) match {
      case (s: Aggregate, m: Aggregate) if s.child.sameResult(m.child) =>
        // rewrite MV exprs onto the subtree's child attribute ids
        // (children are sameResult ⇒ outputs align positionally)
        val idMap = m.child.output.zip(s.child.output)
          .map { case (mo, so) => mo.exprId -> so }.toMap
        def norm(e: Expression): Expression = e.transform {
          case a: AttributeReference => idMap.getOrElse(a.exprId, a)
        }
        def unalias(e: Expression): Expression = e match {
          case Alias(c, _) => c
          case x => x
        }
        val mGroups = m.groupingExpressions.map(norm)
        val groupsMatch = s.groupingExpressions.length == mGroups.length &&
          s.groupingExpressions.forall(g => mGroups.exists(_.semanticEquals(g)))
        if (!groupsMatch) return None
        val mOutputs = m.aggregateExpressions.map(e => unalias(norm(e)))
        val mapping = s.aggregateExpressions.map { se =>
          mOutputs.indexWhere(_.semanticEquals(unalias(se))) match {
            case -1 => None
            case i => Some(i)
          }
        }
        if (mapping.exists(_.isEmpty)) None
        else Some(Project(
          s.aggregateExpressions.zip(mapping.map(_.get)).map { case (out, i) =>
            Alias(scan.output(i), out.name)(exprId = out.exprId): NamedExpression
          }, scan))
      case _ => None
    }

    /** Roll-up: the query groups COARSER than the MV (its grouping
      * expressions are a strict subset), and every aggregate is
      * re-aggregable over the MV's stored partials:
      * sum→sum, min→min, max→max, count→sum(count). avg and distinct
      * aggregates are not decomposable this way and fall through. The
      * rewrite replaces a base-table scan + wide aggregation with a
      * (typically orders-of-magnitude smaller) MV scan + re-agg. */
    private def rollupMatch(sub: LogicalPlan, mvPlan: LogicalPlan,
        scan: LogicalPlan): Option[LogicalPlan] = (sub, mvPlan) match {
      case (s: Aggregate, m: Aggregate)
          if s.groupingExpressions.length < m.groupingExpressions.length =>
        // the two aggregates' children are independently column-pruned
        // Projects over the same base — strip them and inline their
        // alias definitions so expressions compare on base attributes
        def strip(p: LogicalPlan): (LogicalPlan, Map[Long, Expression]) = p match {
          case Project(list, child) =>
            (child, list.map {
              case a: Alias => a.exprId.id -> a.child
              case ar: AttributeReference => ar.exprId.id -> (ar: Expression)
            }.toMap)
          case other => (other, Map.empty[Long, Expression])
        }
        val (sBase, sDefs) = strip(s.child)
        val (mBase, mDefs) = strip(m.child)
        if (!sBase.sameResult(mBase)) return None
        val idMap = mBase.output.zip(sBase.output)
          .map { case (mo, so) => mo.exprId -> so }.toMap
        def inline(e: Expression, defs: Map[Long, Expression]): Expression = e.transform {
          case a: AttributeReference if defs.contains(a.exprId.id) => defs(a.exprId.id)
        }
        def norm(e: Expression): Expression = inline(e, mDefs).transform {
          case a: AttributeReference => idMap.getOrElse(a.exprId, a)
        }
        def snorm(e: Expression): Expression = inline(e, sDefs)
        def unalias(e: Expression): Expression = e match {
          case Alias(c, _) => c
          case x => x
        }
        val mGroups = m.groupingExpressions.map(norm)
        val sGroups = s.groupingExpressions.map(snorm)
        // query groups ⊂ MV groups
        if (!sGroups.forall(g => mGroups.exists(_.semanticEquals(g)))) return None
        val mOutputs = m.aggregateExpressions.map(e => (unalias(norm(e)), e))
        // an MV output column for expression e, as the scan attribute
        def scanColFor(e: Expression): Option[AttributeReference] =
          mOutputs.zipWithIndex.collectFirst {
            case ((me, _), i) if me.semanticEquals(e) =>
              scan.output(i).asInstanceOf[AttributeReference]
          }
        // grouping keys must be stored MV columns
        val groupCols = sGroups.map(scanColFor)
        if (groupCols.exists(_.isEmpty)) return None
        // Rebuild each output over the MV partials. The stored column
        // is matched against the WHOLE output expression (e.g.
        // `cast(sum(x) as double)` — the cast is baked into the stored
        // values); the re-aggregation operator comes from the aggregate
        // function inside: sum/min/max→same over the stored column,
        // count→sum of stored counts.
        def reAgg(out: NamedExpression): Option[NamedExpression] = {
          val e = snorm(unalias(out))
          def finish(re: Expression): Option[NamedExpression] =
            // type must match exactly — sum(decimal) widens precision on
            // re-agg, which would corrupt downstream attribute types
            if (re.dataType == out.dataType) Some(Alias(re, out.name)(exprId = out.exprId))
            else None
          def rollupOf(ae: AggregateExpression): Option[NamedExpression] = {
            if (ae.isDistinct || ae.filter.isDefined) return None
            ae.aggregateFunction match {
              // avg is not itself re-aggregable, but decomposes when the
              // MV stores BOTH sum(x) (possibly cast to double) and
              // count(x): avg = sum(stored sums) / sum(stored counts).
              // count(1) only substitutes for count(x) when x can't be
              // null — otherwise the denominators differ.
              case avg: Average =>
                def sumAgg(c: Expression) =
                  AggregateExpression(new Sum(c), Complete, isDistinct = false)
                val storedSum = scanColFor(sumAgg(avg.child))
                  .orElse(scanColFor(Cast(sumAgg(avg.child), DoubleType)))
                val storedCnt = scanColFor(
                  AggregateExpression(Count(Seq(avg.child)), Complete, isDistinct = false))
                  .orElse(if (!avg.child.nullable)
                    scanColFor(AggregateExpression(Count(Seq(Literal(1))), Complete,
                      isDistinct = false))
                  else None)
                (storedSum, storedCnt) match {
                  case (Some(s), Some(cnt)) =>
                    finish(Divide(Cast(sumAgg(s), DoubleType), Cast(sumAgg(cnt), DoubleType)))
                  case _ => None
                }
              case _ =>
                scanColFor(e).flatMap { c =>
                  val re = ae.aggregateFunction match {
                    case _: Sum => Some(AggregateExpression(new Sum(c), Complete, isDistinct = false))
                    case _: Min => Some(AggregateExpression(Min(c), Complete, isDistinct = false))
                    case _: Max => Some(AggregateExpression(Max(c), Complete, isDistinct = false))
                    case _: Count => Some(AggregateExpression(new Sum(c), Complete, isDistinct = false))
                    case _ => None
                  }
                  re.flatMap(finish)
                }
            }
          }
          e match {
            case ae: AggregateExpression => rollupOf(ae)
            case c: Cast if c.child.isInstanceOf[AggregateExpression] =>
              rollupOf(c.child.asInstanceOf[AggregateExpression])
            case g if sGroups.exists(_.semanticEquals(g)) =>
              scanColFor(g).flatMap(finish)
            case _ => None
          }
        }
        val reAggs = s.aggregateExpressions.map(reAgg)
        if (reAggs.exists(_.isEmpty)) None
        else Some(Aggregate(groupCols.map(_.get), reAggs.map(_.get), scan))
      case _ => None
    }
  }

  /** Install the rule into a session's extra optimizations (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[Rewrite]))
      spark.experimental.extraOptimizations = existing :+ new Rewrite(spark)
  }
}
