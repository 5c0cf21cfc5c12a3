package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import util._

/** Window (analytic) functions — reference executor
  * `be/src/exec/analytor.cpp`, function kernels
  * `be/src/exprs/agg/window.h` (row_number:156, rank:183,
  * dense_rank:224, cume_dist:261, percent_rank:301, ntile:365,
  * first/last_value:417/476, lead/lag:546, session_number:788).
  * Frames per `TAnalyticWindow` (PlanNodes.thrift:1093-1145): ROWS and
  * RANGE with UNBOUNDED/N PRECEDING/FOLLOWING/CURRENT ROW.
  *
  * All map to Spark's WindowExec; ranking top-n filters additionally
  * plan WindowGroupLimit (Catalyst InferWindowGroupLimit), the
  * equivalent of the reference's partition-topn pushdown
  * (`PushDownLimitRankingWindowRule.java`).
  */
object Windows extends graft.QueryArea {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // nth_value over the full partition frame (window.h first/last kin)
    "win_nth_value" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      o.select(col("o_custkey"), col("o_orderkey"),
          round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"),
          round(nth_value(col("o_totalprice"), 3).over(w), 2).as("third_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    // QUALIFY surface (Ops.qualify): top-2 orders per priority via a
    // filter on the window expression; the oracle runs DuckDB's
    // native QUALIFY clause, proving the desugaring is semantics-exact
    "win_qualify" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("price").desc, col("o_orderkey"))
      graft.operators.Ops.qualify(
          o.select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price")),
          row_number().over(w) <= 2)
        .orderBy(col("o_orderpriority"), col("price").desc, col("o_orderkey"))
    }),
    // top-3 orders per customer — ranking window + filter (partition topn)
    "win_partition_topn" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),
    // rank/dense_rank with real ties (order key is a truncated date)
    "win_rank_dense" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(year(col("o_orderdate")))
      o.select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"), dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    "win_ntile_cume" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      o.select(col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(cume_dist().over(w), 6).as("cd"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy(col("o_orderkey"))
    }),
    "win_lead_lag" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.select(col("event_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          lag(col("value"), 2, -1.0).over(w).as("prev2_or_default"))
        .orderBy(col("event_id"))
    }),
    "win_first_last" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      o.select(col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"))
        .orderBy(col("o_orderkey"))
    }),
    // Rolling regression slope: per-user trend of value over its last
    // 10 observations (x = position index), every moment — the four
    // raw sums computed as DECIMAL window aggregates over the frame,
    // slope derived in double. The windowed form of agg_regression.
    "win_rolling_slope" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH idx AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id,
        |    count(*) OVER f AS n,
        |    CAST(sum(CAST(x AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * value AS DECIMAL(28,6))) OVER f AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x * x AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sxx
        |  FROM idx
        |  WINDOW f AS (PARTITION BY user_id ORDER BY x
        |               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
        |FROM w WHERE n >= 3 ORDER BY event_id""".stripMargin)),
    // rolling exact median: Catalyst's Percentile aggregate evaluated
    // as a WINDOW function over a sliding 20-row frame — per-frame
    // state is 20 values, so the window scales like any sliding agg
    "win_rolling_median" -> ((spark, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, Window.currentRow)
      t(spark, dir, "events")
        .select(col("event_id"),
          round(expr("percentile(value, 0.5)").over(w), 6).as("roll_med"))
        .orderBy(col("event_id"))
    }),
    "win_running_sum" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
            .cast("double").as("running_total"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy(col("o_orderkey"))
    }),
    // sliding ROWS frame: 2 preceding .. current
    "win_sliding_rows" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      o.select(col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
            .cast("double").as("windowed_total"))
        .orderBy(col("o_orderkey"))
    }),
    // RANGE frame with a numeric offset
    "win_range_frame" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT s_suppkey,
        |  count(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
        |                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_near
        |FROM supplier ORDER BY s_suppkey""".stripMargin)),
    // time-series gap filling: a generated date spine LEFT-joined to
    // sparse daily sums, then LOCF (last observation carried forward)
    // via last_value IGNORE NULLS over an unbounded-preceding frame —
    // the interpolation step of time-series reporting. Leading days
    // before a series' first observation stay NULL by design.
    "ts_gap_fill_locf" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val daily = e.filter(col("value") > 250)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("v"))
      val spine = e.select(col("event_type")).distinct()
        .crossJoin(spark.range(1).select(explode(sequence(
          lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"),
          expr("interval 1 day"))).as("day")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("v").isNotNull.as("observed"),
          round(last(col("v"), ignoreNulls = true).over(w), 2).as("v_locf"))
        .orderBy(col("event_type"), col("day"))
    }),
    // linear interpolation between bracketing observations (the step
    // up from LOCF): prev/next values + their days come from
    // ignore-nulls window scans, interior gaps get the weighted
    // average, edges fall back to nearest observation
    "ts_interpolate_linear" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val daily = e.filter(col("value") > 250)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(dsum(col("value")).as("v"))
      val spine = e.select(col("event_type")).distinct()
        .crossJoin(spark.range(1).select(explode(sequence(
          lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"),
          expr("interval 1 day"))).as("day")))
      val wB = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("event_type", "day"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
        .withColumn("pd",
          last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wB))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wF))
        .withColumn("nd",
          first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wF))
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("v").isNotNull.as("observed"),
          round(
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                datediff(col("day"), col("pd")) /
                datediff(col("nd"), col("pd"))), 4).as("v_interp"))
        .orderBy(col("event_type"), col("day"))
    }),
    // event-time RANGE frame with INTERVAL bounds: 7-day trailing sum
    // per type — the time-windowed running metric of ops dashboards;
    // frame membership depends only on ts values, so ties are
    // deterministic (peers share the frame)
    // Spark evaluates interval RANGE frames by re-aggregating the
    // in-frame buffer PER ROW (no retractable aggs) — O(rows x frame
    // width) per partition, measured 52 s on full-SF events. This gate
    // checks the FEATURE's semantics on a bounded slice; the
    // scale-shaped formulation of the same analytic is
    // ts_trailing_event below (union +/- trick, running ROWS frame).
    "win_range_interval" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT event_id, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_7d
        |FROM events WHERE user_id % 50 = 0
        |ORDER BY event_id LIMIT 2000""".stripMargin)),
    // Event-time trailing 7-day sum at full SF, O(n log n): each event
    // contributes +v at ts and -v at ts + 7d; a running (unbounded
    // preceding) ROWS sum over the merged timeline, negatives ordered
    // AFTER coincident positives so the inclusive [t-7d, t] boundary
    // matches RANGE INTERVAL PRECEDING semantics. The running frame
    // is O(1) per row where the interval RANGE frame re-aggregates
    // the whole window — this is the 100 TB form of the analytic.
    "ts_trailing_event" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
        .select(col("event_id"), col("event_type"), col("ts"),
          col("value").cast("decimal(18,6)").as("v"))
      val pos = e.select(col("event_type"), col("ts"), lit(0).as("kind"),
        col("v"), col("event_id"))
      val neg = e.select(col("event_type"),
        (col("ts") + expr("INTERVAL 7 DAYS")).as("ts"), lit(1).as("kind"),
        (-col("v")).as("v"), lit(null).cast("long").as("event_id"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // RANGE frames include same-ts PEERS of the current row; the
      // running ROWS sum stops at the row itself, so close over peers
      // by taking the run of the LAST positive at the same instant
      val peers = Window.partitionBy(col("event_type"), col("ts"), col("kind"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      pos.unionByName(neg)
        .withColumn("run", sum(col("v")).over(w))
        .withColumn("runPeers", last(col("run")).over(peers))
        .filter(col("kind") === 0)
        .select(col("event_id"), col("event_type"),
          col("runPeers").cast("double").as("trailing_7d"))
        .orderBy(col("event_id")).limit(2000)
    }),
    // gaps-and-islands: per-user runs of CONSECUTIVE active calendar
    // days (distinct days minus a row_number ladder share a group key);
    // island count + longest streak per user. One shuffle on user_id
    // feeds the window AND both aggregations — the streak computation
    // of retention dashboards without a self-join
    "ts_islands" -> ((spark, dir) => {
      val days = t(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      val runs = days
        .withColumn("grp", date_sub(col("d"), row_number().over(w)))
        .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
      runs.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"), max(col("len")).as("max_run"))
        .orderBy(col("user_id"))
    }),
    // plain aggregate over an unordered partition window
    "win_agg_over_partition" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      val w = Window.partitionBy(col("c_nationkey"))
      c.select(col("c_custkey"),
          count(lit(1)).over(w).as("nation_n"),
          round(avg(col("c_acctbal")).over(w), 4).as("nation_avg_bal"))
        .orderBy(col("c_custkey"))
    }),
    // sessionization: session_number ≈ running sum of gap>30min flags
    // (reference window.h:788 session_number; same pattern the FE
    // plans for sessionize)
    "win_session_number" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = when(
        col("ts").cast("long") - lag(col("ts"), 1).over(wOrd).cast("long") > 1800, 1)
        .otherwise(0)
      e.withColumn("gap_flag", gap)
        .withColumn("session_no",
          sum(col("gap_flag")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("session_no").cast("long").as("session_no"))
        .orderBy(col("event_id"))
    }))

  def oracles: Map[String, String] = Map(
    "win_qualify" ->
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY o_orderpriority
        |  ORDER BY round(o_totalprice, 2) DESC, o_orderkey) <= 2
        |ORDER BY o_orderpriority, price DESC, o_orderkey""".stripMargin,
    "win_range_interval" ->
      """SELECT event_id, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_7d
        |FROM events WHERE user_id % 50 = 0
        |ORDER BY event_id LIMIT 2000""".stripMargin,
    // independent recomputation with DuckDB's native interval RANGE
    // frame — also pins the inclusive [t-7d, t] boundary and same-ts
    // peer semantics of the +/- union formulation
    "ts_trailing_event" ->
      """SELECT event_id, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS trailing_7d
        |FROM events ORDER BY event_id LIMIT 2000""".stripMargin,
    "ts_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |isl AS (
        |  SELECT user_id, d,
        |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS INTEGER) AS grp
        |  FROM days),
        |runs AS (
        |  SELECT user_id, grp, count(*) AS len FROM isl GROUP BY user_id, grp)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS max_run
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_gap_fill_locf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events WHERE value > 250 GROUP BY 1, 2),
        |spine AS (
        |  SELECT t.event_type, CAST(d.day AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS day) d)
        |SELECT s.event_type, CAST(s.day AS STRING) AS day,
        |  d.v IS NOT NULL AS observed,
        |  round(last_value(d.v IGNORE NULLS) OVER (PARTITION BY s.event_type
        |    ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS v_locf
        |FROM spine s LEFT JOIN daily d
        |  ON s.event_type = d.event_type AND s.day = d.day
        |ORDER BY s.event_type, s.day""".stripMargin,
    "ts_interpolate_linear" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events WHERE value > 250 GROUP BY 1, 2),
        |spine AS (
        |  SELECT t.event_type, CAST(d.day AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS day) d),
        |j AS (
        |  SELECT s.event_type, s.day, d.v,
        |    last_value(d.v IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER wb AS pd,
        |    first_value(d.v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
        |      OVER wf AS nd
        |  FROM spine s LEFT JOIN daily d
        |    ON s.event_type = d.event_type AND s.day = d.day
        |  WINDOW wb AS (PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, CAST(day AS STRING) AS day,
        |  v IS NOT NULL AS observed,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * datediff('day', pd, day)
        |      / datediff('day', pd, nd) END, 4) AS v_interp
        |FROM j ORDER BY event_type, day""".stripMargin,
    "win_nth_value" ->
      """SELECT o_custkey, o_orderkey,
        |  round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
        |  round(nth_value(o_totalprice, 3) OVER w, 2) AS third_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_partition_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_rank_dense" ->
      """SELECT o_custkey, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY year(o_orderdate))
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_ntile_cume" ->
      """SELECT o_orderkey, ntile(4) OVER w AS quartile,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  round(percent_rank() OVER w, 6) AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "win_lead_lag" ->
      """SELECT event_id,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  lag(value, 2, -1.0) OVER w AS prev2_or_default
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_first_last" ->
      """SELECT o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "win_rolling_slope" ->
      """WITH idx AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id,
        |    count(*) OVER f AS n,
        |    CAST(sum(CAST(x AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * value AS DECIMAL(28,6))) OVER f AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x * x AS DECIMAL(18,6))) OVER f AS DOUBLE) AS sxx
        |  FROM idx
        |  WINDOW f AS (PARTITION BY user_id ORDER BY x
        |               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
        |FROM w WHERE n >= 3 ORDER BY event_id""".stripMargin,
    "win_rolling_median" ->
      """SELECT event_id,
        |  round(quantile_cont(value, 0.5) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 6) AS roll_med
        |FROM events ORDER BY event_id""".stripMargin,
    "win_running_sum" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_total,
        |  count(*) OVER w AS running_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "win_sliding_rows" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS windowed_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "win_range_frame" ->
      """SELECT s_suppkey,
        |  count(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
        |                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_near
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "win_agg_over_partition" ->
      """SELECT c_custkey,
        |  count(*) OVER w AS nation_n,
        |  round(avg(c_acctbal) OVER w, 4) AS nation_avg_bal
        |FROM customer WINDOW w AS (PARTITION BY c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "win_session_number" ->
      """SELECT event_id, user_id,
        |  sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_no
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN epoch(ts) - epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
        |         THEN 1 ELSE 0 END AS gap_flag
        |  FROM events)
        |ORDER BY event_id""".stripMargin)
}
