package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression}
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
  * Lake snapshot's table properties ([[append]] keeps them
  * materialized; a PLAIN `Lake.write` append lacking the column drops
  * that spec — inherited metadata must never promise a column the
  * files don't carry); [[register]] parses the specs against the
  * table's scan and [[install]] adds an optimizer rule — gated on
  * [[EnabledKey]], following the RangeJoinRewrite opt-in convention so
  * an installed rule is inert outside its users — that substitutes any
  * matching expression in a Project / Filter / Aggregate sitting in
  * the stored column's scope with the column's attribute.
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

  /** Rewrite opt-in switch — set "true" around queries that should use
    * registered specs; unset/false leaves every plan untouched. */
  val EnabledKey = "spark.graft.generatedColumns.enabled"

  /** table path -> (generated col name -> expr SQL). */
  private val registry = TrieMap.empty[String, Map[String, String]]

  /** Materialize `specs` (name -> SQL over the input columns) and
    * write to a Lake table, recording the specs as table properties.
    * The props amendment is PINNED to the data commit it describes
    * (commitAmended refuses a concurrent commit in between — specs can
    * never end up stamped onto someone else's data). Returns the
    * committed version (the props amendment commit). */
  def write(df: DataFrame, table: String, specs: Seq[(String, String)],
      partitionCols: Seq[String] = Nil, mode: String = "overwrite",
      sortBy: Seq[String] = Nil, nFiles: Int = 8): Int = {
    require(specs.nonEmpty, "no generated columns")
    val out = specs.foldLeft(df) { case (d, (c, sql)) => d.withColumn(c, expr(sql)) }
    val v = if (sortBy.nonEmpty)
      Lake.sortKeyWrite(out, table, sortBy, nFiles, mode, partitionCols)
    else Lake.write(out, table, partitionCols, mode)
    Lake.setProps(df.sparkSession, table,
      specs.map { case (c, sql) => s"generated.$c" -> sql }.toMap,
      expectVersion = Some(v))
  }

  /** Append new rows with the table's generated columns MATERIALIZED
    * (the reference's loader-computed semantics — the load computes
    * them, not the reader). Returns the committed version. */
  def append(df: DataFrame, table: String): Int = {
    val spark = df.sparkSession
    val snap = Lake.readSnapshot(spark, table, Lake.currentVersion(spark, table))
    val specs = snap.props.collect {
      case (k, v) if k.startsWith("generated.") => k.stripPrefix("generated.") -> v
    }
    val out = specs.foldLeft(df) { case (d, (c, sql)) => d.withColumn(c, expr(sql)) }
    Lake.write(out, table, snap.partitionCols, mode = "append")
  }

  /** Load the table's generated-column specs from its snapshot props
    * into the rewrite registry (and [[install]] the rule). A table
    * whose specs are GONE (overwritten without them, or dropped by a
    * plain append) is removed — a stale registration would rewrite
    * against a definition the files no longer satisfy. */
  def register(spark: SparkSession, table: String): Unit = {
    val snap = Lake.readSnapshot(spark, table, Lake.currentVersion(spark, table))
    val specs = snap.props.collect {
      case (k, v) if k.startsWith("generated.") => k.stripPrefix("generated.") -> v
    }
    val key = normTable(table)
    exprCache.keys.filter(_._1 == key).foreach(exprCache.remove)
    if (specs.nonEmpty) { registry.put(key, specs); install(spark) }
    else registry.remove(key)
  }

  def deregister(table: String): Unit = {
    val key = normTable(table)
    registry.remove(key)
    exprCache.keys.filter(_._1 == key).foreach(exprCache.remove)
  }
  def clear(): Unit = { registry.clear(); exprCache.clear() }

  private def normTable(t: String) =
    new org.apache.hadoop.fs.Path(t).toUri.getPath

  /** Resolved-definition cache, keyed on (table, col, SQL) so a spec
    * CHANGE can never serve the previous definition; register/
    * deregister also evict the table's entries. */
  private val exprCache = TrieMap.empty[(String, String, String), Expression]

  /** Idempotent rule installation (the MvRewrite mechanism). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[Rewrite]))
      spark.experimental.extraOptimizations = existing :+ new Rewrite(spark)
  }

  final class Rewrite(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty ||
          !spark.conf.getOption(EnabledKey).contains("true")) return plan
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
              replace(e, ge, ga).asInstanceOf[NamedExpression]))
          }
        case a @ Aggregate(_, _, child, _) =>
          subs(child).foldLeft(a: LogicalPlan) { case (n, (ge, ga)) =>
            val ag = n.asInstanceOf[Aggregate]
            ag.copy(
              groupingExpressions = ag.groupingExpressions.map(replace(_, ge, ga)),
              aggregateExpressions = ag.aggregateExpressions.map(e =>
                replace(e, ge, ga).asInstanceOf[NamedExpression]))
          }
      }
    }

    /** Substitution pairs valid at `child`'s output scope: for every
      * registered Lake relation reachable below, the definition expr
      * RESOLVED against the relation's attributes plus the stored
      * column's attribute — kept only when that attribute survives to
      * `child.outputSet`. The resolved form comes from Catalyst's own
      * parser+analyzer against a scan Dataset, so function resolution
      * matches the query side exactly. */
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
      * Cached per (table, col, sql) and remapped onto this relation
      * instance's exprIds (self-joins give each instance fresh ids). */
    private def resolved(table: String, genCol: String, sql: String,
        lr: LogicalRelation): Option[Expression] =
      try {
        val template = exprCache.getOrElseUpdate((normTable(table), genCol, sql), {
          val scan = Lake.read(spark, table)
          scan.select(expr(sql).as("__g")).queryExecution.analyzed
            .asInstanceOf[Project].projectList.head
            .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Alias].child
        })
        // remap template attribute refs onto THIS relation's exprIds by name
        val byName = lr.output.map(a => a.name -> a).toMap
        Some(template.transform {
          case a: Attribute => byName.getOrElse(a.name, a)
        })
      } catch { case _: Exception => None }

    private def replace(e: Expression, ge: Expression, ga: Attribute): Expression =
      e.transform { case x if x.semanticEquals(ge) => ga }
  }
}
