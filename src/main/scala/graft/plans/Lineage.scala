package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage: for every output column of a query, the set
  * of (source table, source column) leaves it derives from — the
  * audit/impact-analysis surface a warehouse catalog exposes (the
  * reference tracks it through the FE's analyzed plans). Walks the
  * ANALYZED logical plan once, propagating leaf provenance through
  * Project/Aggregate/Window/Generate/Union/Join/Expand; filter and
  * join predicates are control-flow, not data lineage, and are
  * deliberately excluded (standard direct-lineage semantics). */
object Lineage {

  private type Sources = Map[ExprId, Set[(String, String)]]

  private def tableName(lr: LogicalRelation): String = lr.relation match {
    case h: HadoopFsRelation =>
      val p = h.location.rootPaths.headOption.map(_.getName).getOrElse("unknown")
      p.stripSuffix(".parquet")
    case _ => lr.catalogTable.map(_.identifier.table).getOrElse("unknown")
  }

  private def resolve(plan: LogicalPlan): Sources = plan match {
    case lr: LogicalRelation =>
      val t = tableName(lr)
      lr.output.map(a => a.exprId -> Set(t -> a.name)).toMap
    case p: Project =>
      val child = resolve(p.child)
      child ++ named(p.projectList, child)
    case a: Aggregate =>
      val child = resolve(a.child)
      child ++ named(a.aggregateExpressions, child)
    case w: Window =>
      val child = resolve(w.child)
      child ++ named(w.windowExpressions, child)
    case g: Generate =>
      val child = resolve(g.child)
      val gen = g.generator.references.toSeq
        .flatMap(r => child.getOrElse(r.exprId, Set.empty)).toSet
      child ++ g.generatorOutput.map(_.exprId -> gen)
    case e: Expand =>
      val child = resolve(e.child)
      child ++ e.output.zipWithIndex.map { case (out, i) =>
        val per = e.projections.flatMap(row =>
          if (i < row.size) row(i).references.toSeq else Nil)
          .flatMap(r => child.getOrElse(r.exprId, Set.empty)).toSet
        out.exprId -> per
      }
    case u: Union =>
      val childMaps = u.children.map(c => (resolve(c), c.output))
      val merged = childMaps.flatMap(_._1).toMap
      merged ++ u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> childMaps.flatMap { case (m, outs) =>
          if (i < outs.size) m.getOrElse(outs(i).exprId, Set.empty) else Set.empty
        }.toSet
      }
    case s: SubqueryAlias => resolve(s.child)
    case other =>
      other.children.map(resolve).foldLeft(Map.empty: Sources)(_ ++ _)
  }

  private def named(exprs: Seq[NamedExpression], child: Sources): Sources =
    exprs.map { ne =>
      ne.exprId -> ne.references.toSeq
        .flatMap(r => child.getOrElse(r.exprId, Set.empty)).toSet
    }.toMap

  /** (out_col, source_table, source_col) rows for every output column
    * of `df`, sorted — the catalog's lineage view. */
  def columnLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val plan = df.queryExecution.analyzed
    val sources = resolve(plan)
    plan.output.flatMap { a: Attribute =>
      sources.getOrElse(a.exprId, Set.empty).toSeq
        .map { case (t, c) => (a.name, t, c) }
    }.sortBy(x => (x._1, x._2, x._3))
      .toDF("out_col", "source_table", "source_col")
  }
}
