package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.plans.MvRewrite

/** MV auto-rewrite: a query whose plan matches a registered MV
  * definition must read the materialized parquet instead of
  * re-aggregating the fact table; non-matching queries are untouched. */
class MvRewriteSpec extends SparkSuite with BeforeAndAfterAll {
  import spark.implicits._

  private def dailyRevenue: DataFrame =
    table("orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("d"), $"o_orderpriority")
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n"))

  private lazy val mvPath = Files.createTempDirectory("graft-mvrw").toString + "/daily_revenue"

  override def beforeAll(): Unit = {
    super.beforeAll()
    MvRewrite.register(spark, "daily_revenue", dailyRevenue, mvPath)
    MvRewrite.install(spark)
  }

  override def afterAll(): Unit = {
    MvRewrite.clear()
    super.afterAll()
  }

  /** Root paths of every file relation in the optimized plan. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten

  test("matching query is rewritten to scan the MV (no re-aggregation of the base)") {
    val q = dailyRevenue // same definition, fresh plan/expr-ids
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(scanPaths(q).exists(_.contains("daily_revenue")), s"MV scan not substituted:\n$optimized")
    assert(!optimized.contains("Aggregate"), s"base table still re-aggregated:\n$optimized")
  }

  test("rewritten results equal the direct computation") {
    MvRewrite.clear() // compute the truth without the rule
    val direct = dailyRevenue.orderBy($"d", $"o_orderpriority").collect()
    MvRewrite.register(spark, "daily_revenue", dailyRevenue, mvPath)
    val viaMv = dailyRevenue.orderBy($"d", $"o_orderpriority").collect()
    assert(viaMv.map(_.toString).toSeq === direct.map(_.toString).toSeq)
  }

  test("rewrite applies when the MV is a subtree of a larger query") {
    val q = dailyRevenue.filter($"n" > 1).agg(sum($"revenue").as("total"))
    assert(scanPaths(q).exists(_.contains("daily_revenue")),
      s"subtree not rewritten:\n${q.queryExecution.optimizedPlan}")
    assert(q.head.getDouble(0) > 0)
  }

  test("non-matching query is untouched") {
    val q = table("orders")
      .groupBy($"o_orderpriority") // different grouping
      .agg(count(lit(1)).as("n"))
    assert(!scanPaths(q).exists(_.contains("daily_revenue")), "unrelated query hijacked by MV")
  }

  test("re-register (refresh) while the rule is installed does not self-reference") {
    MvRewrite.register(spark, "daily_revenue", dailyRevenue, mvPath)
    MvRewrite.register(spark, "daily_revenue", dailyRevenue, mvPath) // refresh cycle
    assert(scanPaths(dailyRevenue).exists(_.contains("daily_revenue")))
    assert(spark.read.parquet(mvPath).count() > 0, "refresh clobbered the MV data")
  }

  test("deregister stops rewriting") {
    MvRewrite.deregister("daily_revenue")
    assert(!scanPaths(dailyRevenue).exists(_.contains("daily_revenue")))
    MvRewrite.register(spark, "daily_revenue", dailyRevenue, mvPath)
  }
}
