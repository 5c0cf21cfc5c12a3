package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Post-execution operator metrics — the reference's EXPLAIN ANALYZE /
  * query profile surface (FE `ExplainAnalyzer.java`, BE runtime
  * profiles): per-operator output rows, spill/shuffle sizes, timing,
  * read straight from the executed plan's SQL metrics.
  *
  * AQE caveat (same as the plan tests): metrics live on the FINAL
  * adaptive plan, and `plan.collect` stops at query-stage boundaries —
  * both are unwrapped here recursively.
  */
object QueryProfile {

  final case class OpMetrics(depth: Int, node: String, metrics: Map[String, Long]) {
    def rows: Option[Long] =
      metrics.get("number of output rows").orElse(metrics.get("numOutputRows"))
  }

  /** Execute and return one row per physical operator. The plan is
    * driven through ITS OWN RDD (a `df.write` would build a separate
    * QueryExecution whose metrics this profile would never see);
    * nothing is collected to the driver. */
  def profile(df: DataFrame, materialize: Boolean = true): Seq[OpMetrics] = {
    if (materialize) df.queryExecution.executedPlan.execute().foreach(_ => ())
    walk(df.queryExecution.executedPlan, 0)
  }

  private def walk(p: SparkPlan, depth: Int): Seq[OpMetrics] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
    case s: QueryStageExec => walk(s.plan, depth)
    case other =>
      val m = other.metrics.map { case (k, metric) => metric.name.getOrElse(k) -> metric.value }
      OpMetrics(depth, other.nodeName, m.toMap) +:
        other.children.flatMap(walk(_, depth + 1))
  }

  /** Human-readable profile (operator tree + headline metrics). */
  def profileString(df: DataFrame, materialize: Boolean = true): String =
    profile(df, materialize).map { op =>
      val headline = Seq(
        op.rows.map(r => s"rows=$r"),
        op.metrics.get("spill size").filter(_ > 0).map(s => s"spill=$s"),
        op.metrics.get("data size").filter(_ > 0).map(s => s"bytes=$s"))
        .flatten.mkString(" ")
      ("  " * op.depth) + op.node + (if (headline.nonEmpty) s"  [$headline]" else "")
    }.mkString("\n")
}
