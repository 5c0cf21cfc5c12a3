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

  test("min/max IVM: delete at the extreme rescans ONLY affected groups; inner deletes never rescan") {
    import graft.operators.MaterializedViews
    import graft.sources.Lake
    val dir = Files.createTempDirectory("graft_ivm_mx").toString + "/t"
    // base partitioned BY THE GROUP so the rescan's IN-filter prunes
    // files — the bounded-rescan contract is observable in the index
    val base0 = spark.range(0, 1000).select(
      ($"id" % 10).cast("int").as("g"), ($"id" * 3 % 997).cast("double").as("v"))
    Lake.write(base0.repartition($"g"), dir, Seq("g"))
    val mv = Lake.read(spark, dir).groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"),
        min($"v").as("mn"), max($"v").as("mx"))
      .localCheckpoint(true)
    // the max of group 3: delete it (forces rescan of g=3 only) and
    // delete a strictly-inner value of group 7 (no rescan)
    val mx3 = mv.filter($"g" === 3).head.getAs[Double]("mx")
    Lake.delete(spark, dir, $"g" === 3 && $"v" === mx3)
    val inner7 = Lake.read(spark, dir).filter($"g" === 7)
      .orderBy($"v").limit(3).orderBy($"v".desc).limit(1)
      .head.getAs[Double]("v") // third-smallest: strictly inside (mn, mx)
    Lake.delete(spark, dir, $"g" === 7 && $"v" === inner7)
    val feed = Seq((3, mx3, "delete"), (7, inner7, "delete"))
      .toDF("g", "v", "__change_type")
    val (baseDf, index) = Lake.readIndexed(spark, dir)
    val got = MaterializedViews.applyDeltaMinMax(mv, feed,
      baseDf.select($"g", $"v")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3), r.getDouble(4))))
      .toMap
    val want = Lake.read(spark, dir).groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"v").as("mn"), max($"v").as("mx"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got === want, "maintained MV != full recompute")
    // ONLY group 3's files were rescanned (1 of 10 partitions)
    assert(index.lastSelectedFileCount < index.totalFileCount,
      s"rescan read ${index.lastSelectedFileCount}/${index.totalFileCount} files — not group-bounded")
    assert(index.lastSelectedFileCount === index.totalFileCount / 10,
      s"rescan touched ${index.lastSelectedFileCount} files, expected one partition's")

    // insert-only maintenance never plans the base at all
    val feed2 = Seq((5, 99999.0, "insert"), (11, 1.0, "insert"))
      .toDF("g", "v", "__change_type")
    val (baseDf2, index2) = Lake.readIndexed(spark, dir)
    val got2 = MaterializedViews.applyDeltaMinMax(mv, feed2,
      baseDf2.select($"g", $"v")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(index2.lastSelectedFileCount === -1,
      "insert-only feed must not touch the base")
    assert(got2(5)._3 === 99999.0, "insert must extend the max delta-only")
    assert(got2(11) === ((1L, 1.0, 1.0)), "new group from inserts")
  }

  test("maintained min/max MV: exactly-once across a crash between apply and cursor commit") {
    import graft.operators.MaterializedViews
    import graft.sources.Lake
    val table = Files.createTempDirectory("graft_mvp_t").toString + "/t"
    val mvDir = Files.createTempDirectory("graft_mvp_s").toString
    val ledger = s"$mvDir/cursor"
    Lake.write(spark.range(0, 500).select(($"id" % 4).cast("int").as("g"),
      ($"id" * 7 % 501).cast("double").as("p")), table, Nil)     // v1
    val gv = (df: DataFrame) => (col("g"), col("p").cast("decimal(18,6)"))
    def poll(fail: Boolean = false) = MaterializedViews
      .maintainMinMaxMv(spark, table, mvDir, ledger, gv, failBeforeCommit = fail)
    assert(poll().contains((0, 1)))                              // bootstrap
    Lake.deleteMor(spark, table, $"g" === 2 && $"p" > 400)       // v2: retracts max
    intercept[IllegalStateException] { poll(fail = true) }       // crash after apply
    // replay converges: same window re-applies into the same state
    assert(poll().contains((1, 2)))
    val got = MaterializedViews.readMinMaxMv(spark, mvDir)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDecimal(3).doubleValue(), r.getDecimal(4).doubleValue())))
      .toMap
    val want = Lake.read(spark, table).groupBy($"g")
      .agg(count(lit(1)).as("n"),
        min($"p".cast("decimal(18,6)")).as("mn"),
        max($"p".cast("decimal(18,6)")).as("mx"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue())))
      .toMap
    assert(got === want, "post-crash replay diverged from recompute")
    // a quiet poll is a no-op, cursor stays
    assert(poll() === None)
  }
}
