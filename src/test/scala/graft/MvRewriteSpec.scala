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
      .groupBy($"o_orderstatus") // not an MV grouping column
      .agg(count(lit(1)).as("n"))
    assert(!scanPaths(q).exists(_.contains("daily_revenue")), "unrelated query hijacked by MV")
  }

  test("roll-up: coarser grouping re-aggregates the MV, not the base table") {
    // query groups only by priority — strictly coarser than the MV's
    // (day, priority); sum/count roll up from stored partials
    val rollup = table("orders")
      .groupBy($"o_orderpriority")
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
    // NOTE: the rollup query's inner plan is Aggregate(priority) over
    // the SAME child as the MV definition — the rule must re-aggregate
    // the MV scan instead
    assert(scanPaths(rollup).exists(_.contains("daily_revenue")),
      s"roll-up not rewritten:\n${rollup.queryExecution.optimizedPlan}")
    // collect through the MV first (the DataFrame's plan is already
    // bound to the current MV files), then compute the truth with the
    // registry cleared
    val viaMv = rollup.collect()
    MvRewrite.clear()
    val direct = table("orders")
      .groupBy($"o_orderpriority")
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority").collect()
    MvRewrite.register(spark, "daily_revenue", dailyRevenue, mvPath)
    assert(viaMv.length === direct.length)
    viaMv.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6,
        s"revenue drift: ${a.getDouble(1)} vs ${b.getDouble(1)}")
      assert(a.getLong(2) === b.getLong(2))
    }
  }

  test("roll-up does not fire for non-decomposable aggregates (distinct)") {
    val q = table("orders")
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("nd"))
    assert(!scanPaths(q).exists(_.contains("daily_revenue")),
      "distinct aggregate must not roll up from partials")
  }

  test("roll-up decomposes avg over stored sum(x) + count(x) partials") {
    val avgMvPath = Files.createTempDirectory("graft-mvavg").toString + "/avg_mv"
    val avgMv = table("orders")
      .groupBy(date_trunc("day", $"o_orderdate").as("d"), $"o_orderpriority")
      .agg(sum($"o_totalprice".cast("decimal(18,6)")).cast("double").as("s"),
        count($"o_totalprice".cast("decimal(18,6)")).as("c"))
    MvRewrite.register(spark, "avg_mv", avgMv, avgMvPath)
    try {
      def q = table("orders")
        .groupBy($"o_orderpriority")
        .agg(avg($"o_totalprice".cast("decimal(18,6)")).cast("double").as("a"))
        .orderBy($"o_orderpriority")
      assert(scanPaths(q).exists(_.contains("avg_mv")),
        s"avg roll-up not rewritten:\n${q.queryExecution.optimizedPlan}")
      val viaMv = q.collect()
      MvRewrite.deregister("avg_mv")
      val direct = q.collect()
      viaMv.zip(direct).foreach { case (m, d) =>
        assert(m.getString(0) === d.getString(0))
        assert(math.abs(m.getDouble(1) - d.getDouble(1)) < 1e-6,
          s"avg drift: ${m.getDouble(1)} vs ${d.getDouble(1)}")
      }
    } finally MvRewrite.deregister("avg_mv")
  }

  test("avg roll-up does NOT fire when the MV only stores count(1) of a nullable column") {
    // daily_revenue stores sum + count(1); o_totalprice is nullable in
    // the schema, so count(1) is not a valid avg denominator
    val q = table("orders")
      .groupBy($"o_orderpriority")
      .agg(avg($"o_totalprice".cast("decimal(18,6)")).cast("double").as("a"))
    assert(!scanPaths(q).exists(_.contains("daily_revenue")),
      "avg must not decompose over a row count when the child is nullable")
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
