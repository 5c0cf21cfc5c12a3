package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.expr

import graft.sources.Lake

/** Generated columns — the reference's loader-computed columns with
  * transparent query rewrite (`docs/en/table_design/generated_columns
  * .md`: `col AS expr` is materialized at load, and a query whose
  * expression matches the definition is rewritten to read the stored
  * column instead of recomputing it).
  *
  * Spark-native shape: [[write]] materializes each spec with
  * `withColumn(expr)` and records `generated.<col> -> exprSql` in the
  * Lake snapshot's table properties (appends and CoW rewrites inherit
  * them); [[register]] parses the specs against the table's scan and
  * [[install]] adds an optimizer rule that substitutes any matching
  * expression in a Project / Filter / Aggregate sitting in the stored
  * column's scope with the column's attribute.
  *
  * Why it matters at 100 TB: the substitution is not (mainly) about
  * skipping the recompute — it is that a FILTER on the stored column
  * becomes a pushable attribute predicate, so manifest min/max stats
  * (and a [[graft.sources.BloomIndex]] bloom, and parquet row-group
  * stats) can prune files for a predicate the engine could otherwise
  * only evaluate row-by-row. `WHERE month(o_orderdate) = 3` over a
  * table sort-key-clustered on the generated month column reads
  * O(matching files), not the table.
  *
  * Scope: substitution sites whose child chain exposes the generated
  * attribute (post-optimization that covers the dominant shapes —
  * filters pushed onto the scan and projects/aggregates directly over
  * it); an intermediate Project that already pruned the column simply
  * leaves the expression unrewritten — never wrong, only unoptimized. */
object GeneratedColumns {

  /** table path -> (generated col name -> expr SQL). */
  private val registry = TrieMap.empty[String, Map[String, String]]

  /** Materialize `specs` (name -> SQL over the input columns) and
    * write to a Lake table, recording the specs as table properties.
    * Returns the committed version (the props amendment commit). */
  def write(df: DataFrame, table: String, specs: Seq[(String, String)],
      partitionCols: Seq[String] = Nil, mode: String = "overwrite",
      sortBy: Seq[String] = Nil, nFiles: Int = 8): Int = {
    require(specs.nonEmpty, "no generated columns")
    val out = specs.foldLeft(df) { case (d, (c, sql)) => d.withColumn(c, expr(sql)) }
    if (sortBy.nonEmpty) Lake.sortKeyWrite(out, table, sortBy, nFiles, mode, partitionCols)
    else Lake.write(out, table, partitionCols, mode)
    Lake.setProps(df.sparkSession, table,
      specs.map { case (c, sql) => s"generated.$c" -> sql }.toMap)
  }

  /** Load the table's generated-column specs from its snapshot props
    * into the rewrite registry (and [[install]] the rule). */
  def register(spark: SparkSession, table: String): Unit = {
    val snap = Lake.readSnapshot(spark, table, Lake.currentVersion(spark, table))
    val specs = snap.props.collect {
      case (k, v) if k.startsWith("generated.") => k.stripPrefix("generated.") -> v
    }
    if (specs.nonEmpty) { registry.put(normTable(table), specs); install(spark) }
  }

  def deregister(table: String): Unit = registry.remove(normTable(table))
  def clear(): Unit = registry.clear()

  private def normTable(t: String) =
    new org.apache.hadoop.fs.Path(t).toUri.getPath

  /** Idempotent rule installation (the MvRewrite mechanism). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[Rewrite]))
      spark.experimental.extraOptimizations = existing :+ new Rewrite(spark)
  }

  final class Rewrite(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformUp {
        case f @ Filter(cond, child) =>
          subs(child).foldLeft(f: LogicalPlan) { case (n, (ge, ga)) =>
            n.asInstanceOf[Filter].copy(condition =
              replace(n.asInstanceOf[Filter].condition, ge, ga))
          }
        case p @ Project(list, child) =>
          subs(child).foldLeft(p: LogicalPlan) { case (n, (ge, ga)) =>
            val pr = n.asInstanceOf[Project]
            pr.copy(projectList = pr.projectList.map(e =>
              replace(e, ge, ga).asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
          }
        case a @ Aggregate(_, _, child, _) =>
          subs(child).foldLeft(a: LogicalPlan) { case (n, (ge, ga)) =>
            val ag = n.asInstanceOf[Aggregate]
            ag.copy(
              groupingExpressions = ag.groupingExpressions.map(replace(_, ge, ga)),
              aggregateExpressions = ag.aggregateExpressions.map(e =>
                replace(e, ge, ga).asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
          }
      }
    }

    /** Substitution pairs valid at `child`'s output scope: for every
      * registered Lake relation reachable through Filter/Project nodes
      * that still expose the generated attribute, the definition expr
      * RESOLVED against the relation's attributes plus that attribute.
      * The resolved form comes from Catalyst's own parser+analyzer run
      * against a scan Dataset, so function resolution matches the
      * query side exactly. */
    private def subs(child: LogicalPlan): Seq[(Expression, Attribute)] = {
      val rels = child.collect {
        case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
            if fs.location.isInstanceOf[Lake.LakeFileIndex] =>
          (lr, fs.location.asInstanceOf[Lake.LakeFileIndex].tablePath)
      }
      rels.flatMap { case (lr, table) =>
        registry.getOrElse(normTable(table), Map.empty).toSeq.flatMap {
          case (genCol, sql) =>
            for {
              ga <- lr.output.find(_.name == genCol)
              if child.outputSet.contains(ga)
              ge <- resolved(table, genCol, sql, lr)
            } yield (ge, ga)
        }
      }
    }

    /** Parse+resolve a spec's SQL against the relation's attributes.
      * Cached per (table, col) and remapped onto this relation
      * instance's exprIds (self-joins give each instance fresh ids). */
    private val exprCache = TrieMap.empty[(String, String), (Expression, Seq[String])]
    private def resolved(table: String, genCol: String, sql: String,
        lr: LogicalRelation): Option[Expression] =
      try {
        val (template, names) = exprCache.getOrElseUpdate((normTable(table), genCol), {
          val scan = Lake.read(spark, table)
          val analyzed = scan.select(expr(sql).as("__g")).queryExecution.analyzed
          val e = analyzed.asInstanceOf[Project].projectList.head
            .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Alias].child
          val base = analyzed.children.head.output
          (e, base.map(_.name))
        })
        // remap template attribute refs onto THIS relation's exprIds by name
        val byName = lr.output.map(a => a.name -> a).toMap
        val remapped = template.transform {
          case a: Attribute => byName.getOrElse(a.name, a)
        }
        val _ = names
        Some(remapped)
      } catch { case _: Exception => None }

    private def replace(e: Expression, ge: Expression, ga: Attribute): Expression =
      e.transform { case x if x.semanticEquals(ge) => ga }
  }
}
