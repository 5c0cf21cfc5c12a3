package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import util._

/** Built-in aggregate surface — reference kernels `be/src/exprs/agg/`
  * (sum/avg/count/minmax/maxmin_by/any_value/variance/covariance/
  * group_concat/array_agg/percentile), multi-distinct rewrites
  * (`RewriteMultiDistinctRule.java`), grouping sets / rollup / cube
  * (`be/src/exec/repeat_node.cpp`, REPEAT_NODE), two-phase hash agg
  * (`SplitAggregateRule.java` → Spark partial+final HashAggregateExec,
  * automatic).
  *
  * Type alignment with the DuckDB oracle: Spark SUM(int)→long matches
  * DuckDB CAST(... AS BIGINT); DuckDB SUM(INTEGER) natively returns
  * HUGEINT, so oracles cast. GROUPING id is cast to INT on both sides.
  */
object Aggregates extends graft.QueryArea {

  private val corrMatrixSql: String =
    """WITH s AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sq,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sp,
        |    CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sd,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sqq,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS spp,
        |    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sdd,
        |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sqp,
        |    CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sqd,
        |    CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS spd
        |  FROM lineitem WHERE l_orderkey % 2 = 0)
        |SELECT pair, round(num / sqrt(dx * dy), 6) AS corr FROM (
        |  SELECT pair,
        |    CASE pair WHEN 'quantity_price' THEN n * sqp - sq * sp
        |      WHEN 'quantity_discount' THEN n * sqd - sq * sd
        |      ELSE n * spd - sp * sd END AS num,
        |    CASE pair WHEN 'price_discount' THEN n * spp - sp * sp
        |      ELSE n * sqq - sq * sq END AS dx,
        |    CASE pair WHEN 'quantity_price' THEN n * spp - sp * sp
        |      ELSE n * sdd - sd * sd END AS dy
        |  FROM s CROSS JOIN (
        |    SELECT pair FROM (VALUES ('quantity_price'),
        |      ('quantity_discount'), ('price_discount')) t(pair)) p)
        |ORDER BY pair""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_rollup" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      c.rollup(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)
    }),
    "agg_cube" -> ((spark, dir) => {
      // fan out before the CUBE Expand (×4 row multiplier on a
      // single-task scan; guide §2.5) — dsum is DECIMAL-exact
      val li = graft.operators.Ops.fanOut(t(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity")))
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
          grouping_id().cast("int").as("gid"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),
    "agg_grouping_sets" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),
    "agg_multi_distinct" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_pair"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),
    "agg_stats" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(var_samp(col("l_extendedprice")), 4).as("var_price"),
          round(stddev_pop(col("l_discount")), 6).as("sdp_disc"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 4).as("cov_pq"),
          round(covar_pop(col("l_extendedprice"), col("l_quantity")), 4).as("covp_pq"))
        .orderBy(col("l_returnflag"))
    }),
    // Pairwise correlation matrix over three measures — one scan
    // collects every raw sum (DECIMAL-routed), the three coefficients
    // derive in double; the matrix shape of agg_regression.
    // DataFrame form of corrMatrixSql (still the oracle SQL): the
    // single-row-group testdata file plans as ONE scan task, so the
    // nine decimal product-sums ran on one core — fan out first
    // (guide §2.5; no-op with real file splits). Expressions are the
    // SQL's own fragments, so the doubles are identical.
    "agg_corr_matrix" -> ((spark, dir) => {
      val s = graft.operators.Ops.fanOut(
          t(spark, dir, "lineitem")
            .filter(expr("l_orderkey % 2 = 0"))
            .select(col("l_quantity"), col("l_extendedprice"), col("l_discount")))
        .agg(
          expr("count(*)").as("n"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)").as("sq"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)").as("sp"),
          expr("CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)").as("sd"),
          expr("CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE)").as("sqq"),
          expr("CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)").as("spp"),
          expr("CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS DOUBLE)").as("sdd"),
          expr("CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)").as("sqp"),
          expr("CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE)").as("sqd"),
          expr("CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)").as("spd"))
      val pairs = spark.sql("SELECT pair FROM (VALUES ('quantity_price'), " +
        "('quantity_discount'), ('price_discount')) t(pair)")
      s.crossJoin(pairs)
        .selectExpr("pair",
          """CASE pair WHEN 'quantity_price' THEN n * sqp - sq * sp
             |  WHEN 'quantity_discount' THEN n * sqd - sq * sd
             |  ELSE n * spd - sp * sd END AS num""".stripMargin,
          """CASE pair WHEN 'price_discount' THEN n * spp - sp * sp
             |  ELSE n * sqq - sq * sq END AS dx""".stripMargin,
          """CASE pair WHEN 'quantity_price' THEN n * spp - sp * sp
             |  ELSE n * sdd - sd * sd END AS dy""".stripMargin)
        .selectExpr("pair", "round(num / sqrt(dx * dy), 6) AS corr")
        .orderBy(col("pair"))
    }),
    // ROLLUP with grouping() level tags — subtotal rows carry an
    // explicit level id instead of ambiguous NULLs (grouping_id
    // mechanics; NULL keys coalesce to 'ALL' labels)
    "agg_grouping_id" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS lvl,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY lvl, rf, ls""".stripMargin)),
    // Linear-regression aggregate family (reference FunctionSet
    // corr/covar; SQL-standard regr_*): slope/intercept/r² derived in
    // IEEE double from DECIMAL raw sums, so the result is bit-stable
    // under any partial-agg merge order — the same two-phase shape as
    // any sum, no second pass over the data.
    "agg_regression" -> ((spark, dir) => {
      // fan out before the five DECIMAL product-sums (guide §2.5; the
      // agg_corr_matrix recipe): the single-row-group testdata file
      // plans as ONE scan task, so the decimal partial aggs ran on one
      // core. DECIMAL sums are merge-order-exact — bit-identical.
      val li = graft.operators.Ops.fanOut(t(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")))
      val d = (c: Column) => c.cast("decimal(28,6)")
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(d(col("l_quantity"))).as("sx"),
          sum(d(col("l_extendedprice"))).as("sy"),
          sum(d(col("l_quantity") * col("l_quantity"))).as("sxx"),
          sum(d(col("l_quantity") * col("l_extendedprice"))).as("sxy"),
          sum(d(col("l_extendedprice") * col("l_extendedprice"))).as("syy"))
        .select(col("l_returnflag"), col("n"), {
          val nd = col("n").cast("double")
          val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
          val (sxx, sxy, syy) = (col("sxx").cast("double"),
            col("sxy").cast("double"), col("syy").cast("double"))
          val covn = nd * sxy - sx * sy
          val varxn = nd * sxx - sx * sx
          round(covn / varxn, 6).as("slope")
        }, {
          val nd = col("n").cast("double")
          val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
          val (sxx, sxy) = (col("sxx").cast("double"), col("sxy").cast("double"))
          val slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
          round((sy - slope * sx) / nd, 4).as("intercept")
        }, {
          val nd = col("n").cast("double")
          val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
          val (sxx, sxy, syy) = (col("sxx").cast("double"),
            col("sxy").cast("double"), col("syy").cast("double"))
          val covn = nd * sxy - sx * sy
          round(covn * covn / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 6).as("r2")
        })
        .orderBy(col("l_returnflag"))
    }),
    // Higher central moments — population skewness and excess kurtosis
    // from DECIMAL raw power sums (same bit-stability rationale as
    // agg_regression; reference FunctionSet skew/kurtosis kernels).
    "agg_skew_kurt" -> ((spark, dir) => {
      // fan out before the four DECIMAL power-sums (guide §2.5, the
      // agg_corr_matrix recipe) — order-exact, see agg_regression
      val li = graft.operators.Ops.fanOut(t(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity")))
      val d = (c: Column) => c.cast("decimal(28,6)")
      val q = col("l_quantity")
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(d(q)).as("s1"),
          sum(d(q * q)).as("s2"), sum(d(q * q * q)).as("s3"),
          sum(d(q * q * q * q)).as("s4"))
        .select(col("l_returnflag"), col("n"), {
          val nd = col("n").cast("double")
          val m = col("s1").cast("double") / nd
          val m2 = col("s2").cast("double") / nd - m * m
          val m3 = col("s3").cast("double") / nd -
            lit(3) * m * col("s2").cast("double") / nd + lit(2) * m * m * m
          round(m3 / pow(m2, 1.5), 6).as("skewness")
        }, {
          val nd = col("n").cast("double")
          val m = col("s1").cast("double") / nd
          val m2 = col("s2").cast("double") / nd - m * m
          val m4 = col("s4").cast("double") / nd -
            lit(4) * m * col("s3").cast("double") / nd +
            lit(6) * m * m * col("s2").cast("double") / nd - lit(3) * m * m * m * m
          round(m4 / (m2 * m2) - lit(3), 6).as("kurtosis")
        })
        .orderBy(col("l_returnflag"))
    }),
    // Deterministic mode: most frequent value per group with ties
    // broken toward the SMALLEST value (builtin mode() picks an
    // arbitrary tie winner — useless under a hash-compare gate). Two
    // aggregations plus a window over the already-aggregated counts.
    "agg_mode_det" -> ((spark, dir) => {
      val counts = t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy(col("cnt").desc, col("l_quantity"))
      counts.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
        .orderBy(col("l_returnflag"))
    }),
    "agg_minmax_by" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      o.groupBy(col("o_custkey"))
        .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"),
          max(col("o_totalprice")).as("best_price"),
          min(col("o_totalprice")).as("worst_price"))
        .orderBy(col("o_custkey"))
    }),
    "agg_group_concat" -> ((spark, dir) => {
      val n = t(spark, dir, "nation")
      val c = t(spark, dir, "customer").filter(col("c_acctbal") > 9900)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
        .orderBy(col("n_name"))
    }),
    // group_concat(DISTINCT x ORDER BY x SEPARATOR s) — the reference's
    // distinct-ordered form: collect_set dedups in the partial agg (the
    // buffer caps at the distinct-value count, not the row count)
    "agg_group_concat_distinct" -> ((spark, dir) => {
      val n = t(spark, dir, "nation")
      val c = t(spark, dir, "customer")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), "|")
            .as("segments"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .orderBy(col("n_name"))
    }),
    "agg_array_agg_sorted" -> ((spark, dir) => {
      val s = t(spark, dir, "supplier")
      s.groupBy(col("s_nationkey"))
        .agg(array_join(array_sort(collect_list(col("s_suppkey"))).cast("array<string>"), ",").as("supp_keys"),
          count(lit(1)).as("n"))
        .orderBy(col("s_nationkey"))
    }),
    "agg_percentiles" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      // distributed selection (ExactPercentile): builtin percentile()
      // buffers every value per group and merges on ONE reducer core
      // per group — 8+ s at sf0.1 with 2 groups, unbounded at 100 TB.
      // Histogram refinement gives the same exact values from 3
      // full-parallelism scans with O(1) task memory.
      graft.operators.ExactPercentile.percentiles(
        li, Seq("l_linestatus"), "l_extendedprice",
        Seq("p50" -> 0.5, "p90" -> 0.9, "med" -> 0.5))
        .select(col("l_linestatus"),
          round(col("p50"), 4).as("p50"),
          round(col("p90"), 4).as("p90"),
          round(col("med"), 4).as("med"))
        .orderBy(col("l_linestatus"))
    }),
    "agg_weighted_percentile" -> ((spark, dir) => {
      // exact weighted inverse-CDF quantiles (the reference's
      // percentile_approx_weighted, computed exactly and distributed)
      graft.operators.ExactPercentile.weightedQuantiles(
        t(spark, dir, "lineitem"), Seq("l_linestatus"),
        "l_extendedprice", "l_quantity",
        Seq("wp50" -> 0.5, "wp90" -> 0.9))
        .select(col("l_linestatus"),
          round(col("wp50"), 4).as("wp50"), round(col("wp90"), 4).as("wp90"))
        .orderBy(col("l_linestatus"))
    }),
    "histogram_equi_height" -> ((spark, dir) => {
      // ANALYZE-stats histogram: ~n/8 rows per bucket, quantile cuts
      graft.operators.Ops.equiHeightHistogram(
        t(spark, dir, "lineitem"), "l_extendedprice", buckets = 8)
        .select(col("bucket"), round(col("lower"), 4).as("lower"),
          round(col("upper"), 4).as("upper"), col("cnt"),
          col("cum_count"), col("upper_repeats"))
        .orderBy(col("bucket"))
    }),
    "agg_any_value" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      c.groupBy(col("c_custkey"))
        .agg(any_value(col("c_name")).as("name"), first(col("c_mktsegment")).as("seg"))
        .orderBy(col("c_custkey"))
    }),
    "agg_bool_bit" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      o.groupBy(col("o_custkey"))
        .agg(
          bool_or(col("o_totalprice") > 150000).as("has_big"),
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bit_and(col("o_orderkey")).as("band"),
          bit_or(col("o_orderkey")).as("bor"),
          bit_xor(col("o_orderkey")).as("bxor"))
        .orderBy(col("o_custkey"))
    }),
    "agg_count_if" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(count_if(col("l_discount") > 0.05).as("n_discounted"),
          count_if(col("l_tax") === 0.0).as("n_taxfree"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),
    // approx_count_distinct (reference hll_ndv.h) — the approximate
    // value itself cannot hash-match a DuckDB oracle, so the gate
    // emits the semantic CONTRACT instead: the exact NDV (oracle-
    // computable) plus a boolean asserting the HLL++ estimate landed
    // within 3x its configured relative standard deviation. The
    // estimate is deterministic for fixed input, so the boolean is a
    // stable value check, not a tautology; the raw estimate's error is
    // additionally asserted in ScalaTest.
    "agg_approx_count_distinct" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx_nd"),
          countDistinct(col("l_partkey")).as("exact_nd"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")) <=
            lit(3 * 0.05) * col("exact_nd")).as("within_3rsd"))
        .orderBy(col("l_returnflag"))
    }),
    "agg_global_no_groups" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
        min(col("l_shipdate")).as("min_ship"), max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_orderkey")).as("nd_orders"))
    }),
    "agg_distinct_rows" -> ((spark, dir) => {
      t(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // map_agg (reference be/src/exprs/agg/map_agg.h): entries sorted by
    // key → deterministic to_json for the hash compare
    "agg_map_agg" -> ((spark, dir) => {
      val n = t(spark, dir, "nation")
      n.groupBy(col("n_regionkey"))
        .agg(to_json(expr("map_agg(n_name, n_nationkey)")).as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    }),
    // min_n/max_n (reference be/src/exprs/agg/minmax_n.h): bounded-heap
    // top-n values per group WITHOUT a window or full collect
    "agg_min_max_n" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      o.groupBy(col("o_orderpriority"))
        .agg(
          expr("array_join(cast(min_n(o_orderkey, 5) as array<string>), ',')").as("min5"),
          expr("array_join(cast(max_n(o_orderkey, 3) as array<string>), ',')").as("max3"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }))

  def oracles: Map[String, String] = Map(
    "agg_approx_count_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_nd,
        |  TRUE AS within_3rsd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
        |  CAST(GROUPING(c_mktsegment, c_nationkey) AS INT) AS gid
        |FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp,
        |  count(DISTINCT (l_partkey, l_suppkey)) AS nd_pair,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(var_samp(l_extendedprice), 4) AS var_price,
        |  round(stddev_pop(l_discount), 6) AS sdp_disc,
        |  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 4) AS cov_pq,
        |  round(covar_pop(l_extendedprice, l_quantity), 4) AS covp_pq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_corr_matrix" -> corrMatrixSql,
    "agg_grouping_id" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS lvl,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY lvl, rf, ls""".stripMargin,
    "agg_regression" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
        |    sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS sxx,
        |    sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS sxy,
        |    sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |  round((CAST(sy AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "agg_skew_kurt" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(28,6))) AS s1,
        |    sum(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS s2,
        |    sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(28,6))) AS s3,
        |    sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(28,6))) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT l_returnflag, n,
        |    CAST(s1 AS DOUBLE) / n AS m1,
        |    CAST(s2 AS DOUBLE) / n AS r2,
        |    CAST(s3 AS DOUBLE) / n AS r3,
        |    CAST(s4 AS DOUBLE) / n AS r4
        |  FROM s)
        |SELECT l_returnflag, n,
        |  round((r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1)
        |    / pow(r2 - m1 * m1, 1.5), 6) AS skewness,
        |  round((r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1)
        |    / ((r2 - m1 * m1) * (r2 - m1 * m1)) - 3, 6) AS kurtosis
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "agg_mode_det" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, l_quantity) AS rk
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    "agg_minmax_by" ->
      """SELECT o_custkey,
        |  max_by(o_orderkey, o_totalprice) AS best_order,
        |  min_by(o_orderkey, o_totalprice) AS worst_order,
        |  max(o_totalprice) AS best_price,
        |  min(o_totalprice) AS worst_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_group_concat" ->
      """SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS names
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > 9900
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_group_concat_distinct" ->
      """SELECT n_name,
        |  string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_array_agg_sorted" ->
      """SELECT s_nationkey, array_to_string(list_sort(list(s_suppkey)), ',') AS supp_keys, count(*) AS n
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_linestatus,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(median(l_extendedprice), 4) AS med
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_weighted_percentile" ->
      """WITH c AS (
        |  SELECT l_linestatus, l_extendedprice AS v,
        |    sum(l_quantity) OVER (PARTITION BY l_linestatus ORDER BY l_extendedprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(l_quantity) OVER (PARTITION BY l_linestatus) AS tw
        |  FROM lineitem)
        |SELECT l_linestatus,
        |  round(min(CASE WHEN cw >= 0.5 * tw THEN v END), 4) AS wp50,
        |  round(min(CASE WHEN cw >= 0.9 * tw THEN v END), 4) AS wp90
        |FROM c GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "histogram_equi_height" -> {
      val terms = (1 to 7).map(k => s"(CASE WHEN v > q[$k] THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH c AS (
        |  SELECT quantile_cont(l_extendedprice,
        |    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
        |  FROM lineitem),
        |b AS (
        |  SELECT l_extendedprice AS v, $terms AS bucket
        |  FROM lineitem, c),
        |pb AS (
        |  SELECT bucket, min(v) AS lo, max(v) AS hi, count(*) AS cnt
        |  FROM b GROUP BY bucket),
        |rep AS (
        |  SELECT b.bucket, count(*) AS upper_repeats
        |  FROM b JOIN pb ON b.bucket = pb.bucket AND b.v = pb.hi
        |  GROUP BY b.bucket)
        |SELECT pb.bucket, round(lo, 4) AS lower, round(hi, 4) AS upper, cnt,
        |  CAST(sum(cnt) OVER (ORDER BY pb.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_count,
        |  upper_repeats
        |FROM pb JOIN rep ON pb.bucket = rep.bucket
        |ORDER BY pb.bucket""".stripMargin
    },
    "agg_any_value" ->
      """SELECT c_custkey, any_value(c_name) AS name, any_value(c_mktsegment) AS seg
        |FROM customer GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "agg_bool_bit" ->
      """SELECT o_custkey,
        |  bool_or(o_totalprice > 150000) AS has_big,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bit_and(o_orderkey) AS band,
        |  bit_or(o_orderkey) AS bor,
        |  bit_xor(o_orderkey) AS bxor
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_count_if" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  count(*) FILTER (WHERE l_tax = 0.0) AS n_taxfree,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_global_no_groups" ->
      """SELECT count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
        |  CAST(min(l_shipdate) AS TIMESTAMP) AS min_ship,
        |  CAST(max(l_shipdate) AS TIMESTAMP) AS max_ship,
        |  count(DISTINCT l_orderkey) AS nd_orders
        |FROM lineitem""".stripMargin,
    "agg_distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_map_agg" ->
      """SELECT n_regionkey,
        |  concat('{', string_agg(concat('"', n_name, '":', CAST(n_nationkey AS VARCHAR)), ',' ORDER BY n_name), '}') AS nations,
        |  count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "agg_min_max_n" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(o_orderkey))[1:5], ',') AS min5,
        |  array_to_string(list_sort(list(o_orderkey), 'DESC')[1:3], ',') AS max3,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
