package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import util._

/** Behavioral / event-stream analytics over the `events` table — the
  * reference's user-behavior function family (ref
  * `be/src/exprs/agg/window_funnel.h`, `retention.h`,
  * `gensrc/script/functions.py` sequence_match/sequence_count) extended
  * to the standard warehouse shapes built from the same primitives:
  * SCD2 dimension builds, Markov transition matrices, marketing
  * attribution, interval sweep-lines, cohort retention, robust
  * outlier detection, seasonal baselines, and MATCH_RECOGNIZE-lite
  * sequence patterns.
  *
  * Scale stance: every operator here is one scan plus per-user (or
  * per-type) windows and one aggregation shuffle — user_id partitions
  * the windows, so state per task is one user's event run, never the
  * table. Baseline tables (hour-of-day stats, per-type medians) are
  * group-count-sized and broadcast back onto the facts.
  */
object Behavior extends graft.QueryArea {

  private def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD Type-2 dimension build from a change log: the event stream is
    // a per-user attribute change feed; compress consecutive repeats
    // (a no-op change opens no new version), then each surviving change
    // opens a version [valid_from, valid_to) closed by the next change.
    // One window partition per user — no global sort, no driver state.
    "scd2_dimension" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_type").as("attr"),
          col("event_id"))
        .withColumn("prev", lag("attr", 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("attr"))
      val w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
      changes
        .withColumn("valid_to", lead("ts", 1).over(w2))
        .select(col("user_id"), col("attr"), col("ts").as("valid_from"),
          col("valid_to"), col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from")
    }),

    // Point-in-time (bitemporal) lookup against a derived SCD2
    // dimension: compress each customer's daily order-priority history
    // into versions, then resolve every order against the version in
    // force 30 days earlier — the standard "state as of" dimension
    // probe, executed as one ASOF backward join (no between-join).
    // Daily snapshot granularity makes valid_from unique per customer,
    // so the asof match is deterministic.
    "scd2_point_in_time" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val daily = o.groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(expr("max_by(o_orderpriority, o_orderkey)").as("attr"))
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
      val versions = daily
        .withColumn("prev", lag("attr", 1).over(w))
        .where(col("prev").isNull || col("prev") =!= col("attr"))
        .select(col("o_custkey"), col("o_orderdate").as("valid_from"), col("attr"))
      val probes = o.select(col("o_orderkey"), col("o_custkey"),
        date_sub(col("o_orderdate"), 30).as("asof_d"))
      graft.operators.AsofJoin.asof(probes, versions, Seq("o_custkey"),
          "asof_d", "valid_from", direction = "backward", joinType = "left")
        .select(col("o_orderkey"), col("o_custkey"), col("attr").as("prior_state"))
        .orderBy(col("o_orderkey"))
    }),

    // Markov transition matrix: per-user next-event via lead(), then
    // count per (src, dst) and P(dst|src) as a window share over the
    // already-aggregated 5x5 matrix — the window never sees raw facts.
    "evt_transition_matrix" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = events(spark, dir)
        .withColumn("dst", lead("event_type", 1).over(w))
        .where(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("p", round(col("n") / sum("n")
          .over(Window.partitionBy("src")), 6))
        .orderBy("src", "dst")
    }),

    // Last-touch attribution: credit each purchase to the most recent
    // preceding non-purchase event of the same user within 7 days.
    // Spark side is a SINGLE window pass (carry the last touch forward
    // with last(...ignoreNulls) over rows up to the previous event) —
    // the scalable plan; the oracle recomputes via join + row_number
    // argmax, which is quadratic per user and fine only at oracle SF.
    "evt_attribution_last_touch" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      events(spark, dir)
        .withColumn("touch", last(
          when(col("event_type") =!= "purchase",
            struct(col("ts").as("t"), col("event_type").as("e"))),
          ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase" && col("touch").isNotNull &&
          col("touch.t") >= col("ts") - expr("INTERVAL 7 DAY"))
        .groupBy(col("touch.e").as("touch_type"))
        .agg(count(lit(1)).as("conversions"))
        .orderBy("touch_type")
    }),

    // Linear multi-touch attribution: each purchase's credit divides
    // equally over its preceding 7-day touches; credits aggregate as
    // exact integer microcredits (floor(1e6 / n_touches)) so the sum
    // is order-independent without decimal routing. One window pass
    // collects the touch window; the oracle recomputes via join.
    "evt_attribution_linear" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val withTouches = events(spark, dir)
        .withColumn("touches", collect_list(
          when(col("event_type") =!= "purchase",
            struct(col("ts").as("t"), col("event_type").as("e")))).over(w))
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"),
          filter(col("touches"), t =>
            t.getField("t") >= col("ts") - expr("INTERVAL 7 DAY")).as("touches"))
        .where(size(col("touches")) > 0)
      withTouches
        .select(col("event_id"), size(col("touches")).as("n_touches"),
          explode(col("touches")).as("touch"))
        .groupBy(col("touch.e").as("touch_type"))
        .agg(count(lit(1)).as("n_touchpoints"),
          sum(floor(lit(1000000) / col("n_touches")).cast("long")).as("microcredits"))
        .orderBy("touch_type")
    }),

    // Interval sweep-line: each event occupies [ts, ts + value minutes);
    // peak concurrency per event_type = max running sum of +1/-1 deltas
    // ordered by time (ends sort before starts at the same instant, so
    // touching intervals don't overlap). Explode-to-deltas doubles the
    // rows but keeps the computation one window per type partition.
    "evt_peak_concurrency" -> ((spark, dir) => {
      val ev = events(spark, dir)
        .withColumn("s_us", unix_micros(col("ts")))
        .withColumn("e_us", col("s_us") +
          round(col("value") * 60000000d).cast("long"))
      val deltas = ev.select(col("event_type"), col("s_us").as("t"), lit(1).as("d"))
        .unionAll(ev.select(col("event_type"), col("e_us").as("t"), lit(-1).as("d")))
      val w = Window.partitionBy("event_type").orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("load", sum("d").over(w))
        .groupBy("event_type")
        .agg(max("load").as("peak"))
        .orderBy("event_type")
    }),

    // Cohort retention matrix: cohort = Monday-week of a user's first
    // event; count distinct active users per (cohort week, week offset).
    // Two shuffles total: the per-user min, and the distinct-count agg.
    "cohort_retention_matrix" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val firstTs = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      ev.join(broadcast(firstTs), "user_id")
        .select(
          date_trunc("week", col("first_ts")).as("cohort_week"),
          (datediff(date_trunc("week", col("ts")),
            date_trunc("week", col("first_ts"))) / 7).cast("int").as("week_offset"),
          col("user_id"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Cohort LTV curve: cumulative purchase value per cohort user by
    // week offset — the windows run over the (cohort × offset) matrix,
    // never raw events; sums DECIMAL-routed, division in double.
    "cohort_ltv" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val firstTs = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      val sized = firstTs
        .groupBy(date_trunc("week", col("first_ts")).as("cohort_week"))
        .agg(countDistinct("user_id").as("cohort_size"))
      val weekly = ev.filter(col("event_type") === "purchase")
        .join(broadcast(firstTs), "user_id")
        .groupBy(date_trunc("week", col("first_ts")).as("cohort_week"),
          (datediff(date_trunc("week", col("ts")),
            date_trunc("week", col("first_ts"))) / 7).cast("int").as("week_offset"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("rev"))
      val w = Window.partitionBy("cohort_week").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      weekly.join(broadcast(sized), "cohort_week")
        .withColumn("cum_rev", sum("rev").over(w))
        .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"),
          round(col("cum_rev").cast("double") / col("cohort_size"), 6)
            .as("ltv_per_user"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Survival curve + hazard (Kaplan-Meier-lite on activity): share
    // of each cohort still active at offset t, and the week-to-week
    // drop-off hazard — lag window over the cohort matrix.
    "cohort_survival" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val firstTs = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      val matrix = ev.join(broadcast(firstTs), "user_id")
        .groupBy(date_trunc("week", col("first_ts")).as("cohort_week"),
          (datediff(date_trunc("week", col("ts")),
            date_trunc("week", col("first_ts"))) / 7).cast("int").as("week_offset"))
        .agg(countDistinct("user_id").as("active"))
      val w = Window.partitionBy("cohort_week").orderBy("week_offset")
      matrix
        .withColumn("cohort_size", first("active").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_active", lag("active", 1).over(w))
        .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"),
          round(col("active").cast("double") / col("cohort_size"), 6).as("survival"),
          round(lit(1.0) - col("active").cast("double") /
            col("prev_active"), 6).as("hazard")) // null at offset 0
        .orderBy("cohort_week", "week_offset")
    }),

    // Robust outliers via median/MAD: two aggregation passes (median,
    // then median absolute deviation) with the group-count-sized
    // baselines broadcast back; flag |modified z| > 3.5. percentile()
    // interpolates identically to the oracle's percentile_cont.
    "outlier_mad" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"),
          first("med").as("med"))
      ev.join(broadcast(mad), "event_type")
        .withColumn("z", lit(0.6745) * (col("value") - col("med")) / col("mad"))
        .where(abs(col("z")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("z"), 4).as("z"))
        .orderBy("event_id")
    }),

    // Winsorization: clip each type's values at its exact p01/p99
    // (linear-interpolated percentile, identical to the oracle's
    // quantile_cont), then the clipped mean — the outlier-robust
    // companion to outlier_mad. Clipped values route through DECIMAL
    // so the mean is merge-order stable. Baselines broadcast back.
    "outlier_winsorize" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val pct = ev.groupBy("event_type").agg(
        expr("percentile(value, 0.01)").as("p01"),
        expr("percentile(value, 0.99)").as("p99"))
      ev.join(broadcast(pct), "event_type")
        .withColumn("clipped", least(greatest(col("value"), col("p01")), col("p99")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("p01"), 1L)
            .when(col("value") > col("p99"), 1L).otherwise(0L)).as("n_clipped"),
          (sum(col("clipped").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("winsor_mean"))
        .orderBy("event_type")
    }),

    // Seasonal (hour-of-day) baseline anomalies: per (type, hour) mean
    // and sample stddev computed with DECIMAL sums so the threshold is
    // bit-stable under any partial-agg order, then events beyond
    // mean + 3*sigma. The 5x24 baseline broadcasts back onto the scan.
    "ts_seasonal_anomaly" -> ((spark, dir) => {
      val ev = events(spark, dir)
        .withColumn("hr", hour(col("ts")))
      val base = ev.groupBy("event_type", "hr").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).as("s"),
        sum((col("value") * col("value")).cast("decimal(28,10)")).as("sq"))
        .select(col("event_type"), col("hr"),
          (col("s").cast("double") / col("n")).as("mean"),
          sqrt((col("sq").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1)).as("sd"))
      ev.join(broadcast(base), Seq("event_type", "hr"))
        .where(col("value") > col("mean") + lit(3) * col("sd"))
        .select(col("event_id"), col("event_type"), col("hr"), col("value"),
          round(col("mean") + lit(3) * col("sd"), 4).as("threshold"))
        .orderBy("event_id")
    }),

    // Batch session_window(): Spark's native gap-based session
    // assignment (the same primitive the streaming session gate uses)
    // run in batch mode — one groupBy(user, session_window) pass. The
    // oracle recomputes sessions with the manual cumsum-of-gaps
    // construction, proving the builtin's [start, end) semantics
    // (end = last event + gap) against first principles.
    "evt_session_window_batch" -> ((spark, dir) => {
      events(spark, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_start"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "s_start")
    }),

    // Sessionization report: 30-minute-gap sessions (cumsum of
    // gap>30min flags per user), then per-session duration/size and a
    // per-user rollup — the aggregation layer on top of the
    // win_session_number mechanics.
    "evt_session_stats" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = events(spark, dir)
        .withColumn("gap_us", unix_micros(col("ts")) -
          unix_micros(lag("ts", 1).over(w)))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1)
            .otherwise(0))
        .withColumn("sess", sum("new_sess")
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val perSession = sess.groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"),
          ((unix_micros(max("ts")) - unix_micros(min("ts"))) / 60e6)
            .as("duration_min"))
      perSession.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max("n_events").as("max_events"),
          round(sum(col("duration_min").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 4).as("mean_duration_min"))
        .orderBy("user_id")
    }),

    // Time-weighted average value (TWAP): each observation holds until
    // the next one; weight = holding time. One lead() window plus a
    // DECIMAL-routed ratio aggregate per user.
    "evt_twap" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(spark, dir)
        .withColumn("dt_us", unix_micros(lead("ts", 1).over(w)) -
          unix_micros(col("ts")))
        .where(col("dt_us").isNotNull)
        .groupBy("user_id")
        .agg(round(
          (sum((col("value") * (col("dt_us") / 1e6)).cast("decimal(28,6)")).cast("double") /
            sum((col("dt_us") / 1e6).cast("decimal(28,6)")).cast("double")), 6)
          .as("twap"))
        .orderBy("user_id")
    }),

    // Rolling 7-day distinct actives per day: Spark windows cannot do
    // DISTINCT aggregates over a frame, so each (day, user) activity
    // replicates into the 7 target days it supports and a plain
    // count(DISTINCT) lands per day — bounded 7x replication instead
    // of an unbounded per-frame state, the scalable rewrite.
    "evt_rolling_wau" -> ((spark, dir) => {
      // per-day user BITMAP first (the reference's bitmap_union
      // rollup, `be/src/exprs/agg/bitmap_union.h`): the heavy input
      // collapses map-side into ~#days roaring-bitmap rows, and the
      // 7-day rolling distinct becomes a join over DAYS ONLY — the
      // previous shape shuffled every (day,user) pair ×7 and went
      // 14.4× on the sf10 decade (spill); this one's shuffle is
      // #days bitmaps regardless of user count
      val dayBm = events(spark, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .groupBy(col("day"))
        .agg(graft.operators.Ops.bitmapUnion(col("user_id")).as("bm"))
      val allDays = dayBm.select(col("day"))
      val contrib = dayBm.withColumn("target",
        explode(sequence(col("day"), date_add(col("day"), 6))))
      allDays.join(contrib, allDays("day") === contrib("target"), "left")
        .groupBy(allDays("day"))
        .agg(graft.operators.Ops.bitmapUnion(col("bm")).as("u"))
        .select(date_format(allDays("day"), "yyyy-MM-dd").as("day"),
          graft.operators.Ops.bitmapCount(col("u")).as("wau"))
        .orderBy("day")
    }),

    // Error-burst alarm: error events whose trailing 10-minute window
    // (same user) holds >= 3 errors — a RANGE-interval frame over the
    // error subset only. Shared SQL dialect with the oracle.
    "evt_error_burst" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH e AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
        |w AS (
        |  SELECT event_id, user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY ts
        |      RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
        |      AS burst_n
        |  FROM e)
        |SELECT event_id, user_id, burst_n FROM w
        |WHERE burst_n >= 3 ORDER BY event_id""".stripMargin)),

    // Events-since-last-reset: errors reset a per-user counter, other
    // events increment it — the gaps-and-islands segment trick (cumsum
    // of reset flags defines the segment, position-in-segment is the
    // counter). Two windows over the same per-user ordering: one sort.
    "evt_since_last_reset" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val seg = events(spark, dir)
        .withColumn("seg", sum(when(col("event_type") === "error", 1)
          .otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val wSeg = Window.partitionBy("user_id", "seg").orderBy("ts", "event_id")
      seg.withColumn("n_since", row_number().over(wSeg) - 1)
        .select(col("event_id"), col("n_since").cast("long").as("n_since"))
        .orderBy("event_id")
    }),

    // Activity heatmap: weekday × hour event counts with each cell's
    // share of its weekday — the dashboard crosstab, windows over the
    // 7×24 matrix only. Shared SQL dialect (dayofweek aligned below).
    "evt_heatmap" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH cells AS (
        |  SELECT CAST(dayofweek(ts) AS INT) AS dow,
        |    CAST(hour(ts) AS INT) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hr, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY dow), 6) AS day_share
        |FROM cells ORDER BY dow, hr""".stripMargin)),

    // Stickiness (DAU/MAU): daily actives over trailing-30-day actives
    // per day — the second rolling-distinct rewrite (each (day, user)
    // activity supports 30 target days; bounded 30x replication of the
    // SMALL distinct day-user table, never the raw events).
    "evt_stickiness" -> ((spark, dir) => {
      val du = events(spark, dir)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val contrib = du.withColumn("target",
        explode(sequence(col("day"), date_add(col("day"), 29))))
      val mau = du.select(col("day").as("target")).distinct()
        .join(contrib, "target")
        .groupBy(col("target").as("day"))
        .agg(countDistinct("user_id").as("mau"))
      dau.join(mau, "day")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("mau"),
          round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
        .orderBy("day")
    }),

    // CUSUM drift alarm (SPC monitoring): s_i = max(0, s_{i-1} +
    // (x - target - slack)) per event type over the hourly mean
    // series; alarms where s exceeds h. Same closed form as the
    // clamped balance (lower-bound-only recurrences stay window-
    // expressible; see ts_capped_balance for the both-bounds case).
    "ts_cusum_alarm" -> ((spark, dir) => {
      val hourly = events(spark, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("v"))
      val target = hourly.groupBy("event_type")
        .agg((sum(col("v").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("mu"))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourly.join(broadcast(target), "event_type")
        // quantize increments at scale 6 BEFORE summing: sums stay
        // exact multiples of 1e-6, so the round-6 output can never sit
        // on a half boundary where the engines' double->decimal
        // conversions disagree at the 12th digit
        .withColumn("x", (col("v") - col("mu") - lit(2.0)).cast("decimal(28,6)"))
        .withColumn("ssum", sum("x").over(w))
        .withColumn("low", least(lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
          min("ssum").over(w)))
        // round in EXACT decimal, then cast: rounding the double form
        // hits half-way-boundary drift vs the oracle (e.g. x.xxx3335)
        .withColumn("cusum", col("ssum") - col("low"))
        .where(col("cusum") > 15.0)
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH").as("h"),
          round(col("cusum"), 6).cast("double").as("cusum"))
        .orderBy("event_type", "h")
    }),

    // New-vs-returning daily split: users active each day classified
    // by whether that day is their first-ever day — one per-user min,
    // broadcast onto the per-day distinct actives.
    "evt_new_vs_returning" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val firstDay = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("first_d"))
      ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        .join(broadcast(firstDay), "user_id")
        .groupBy("day")
        .agg(sum(when(col("day") === col("first_d"), 1L).otherwise(0L)).as("n_new"),
          sum(when(col("day") === col("first_d"), 0L).otherwise(1L)).as("n_returning"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_new"), col("n_returning"))
        .orderBy("day")
    }),

    // Top user-journey paths: every 3-step event-type path (two leads
    // per user run), counted and ranked — the path-analysis report
    // behind "what do users do before purchasing". Window on the raw
    // events, aggregation on the 125-at-most path space.
    "evt_top_paths" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(spark, dir)
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .where(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(20)
    }),

    // Time-to-event with censoring (survival-analysis input): hours
    // from first signup to first subsequent purchase; users who never
    // convert are right-censored at their last observed event — the
    // (duration, event) pair every survival model consumes.
    "evt_time_to_event" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("su_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, "user_id").where(col("ts") >= col("su_ts"))
        .groupBy("user_id").agg(min("ts").as("pu_ts"))
      val last = ev.groupBy("user_id").agg(max("ts").as("last_ts"))
      su.join(pu, Seq("user_id"), "left").join(last, "user_id")
        .select(col("user_id"),
          round(((unix_micros(coalesce(col("pu_ts"), col("last_ts"))) -
            unix_micros(col("su_ts"))) / 3600e6), 6).as("duration_h"),
          col("pu_ts").isNotNull.as("converted"))
        .orderBy("user_id")
    }),

    // Conversion-lag percentiles: per first-signup month, the median /
    // p90 hours from a user's first signup to their first subsequent
    // purchase. Two per-user aggregates, then exact interpolated
    // percentiles over the (tiny) per-user lag table.
    "funnel_time_percentiles" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("su_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, "user_id").where(col("ts") >= col("su_ts"))
        .groupBy("user_id").agg(min("ts").as("pu_ts"), first("su_ts").as("su_ts"))
      pu.select(date_trunc("month", col("su_ts")).as("cohort_month"),
          ((unix_micros(col("pu_ts")) - unix_micros(col("su_ts"))) / 3600e6)
            .as("lag_hours"))
        .groupBy("cohort_month")
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(lag_hours, 0.5)"), 4).as("median_hours"),
          round(expr("percentile(lag_hours, 0.9)"), 4).as("p90_hours"))
        .orderBy("cohort_month")
    }),

    // Clamped running balance (stock level that cannot go negative):
    // the recurrence b_i = max(0, b_{i-1} + x_i) has the closed form
    // b_i = S_i - min(0, min_{j<=i} S_j) over prefix sums S — two
    // window passes per key, NO recursion and no per-row state, so it
    // scales exactly like any windowed cumsum. Deltas: purchases add
    // value, errors drain it.
    "ts_clamped_balance" -> ((spark, dir) => {
      val signed = events(spark, dir)
        .where(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "purchase",
            col("value").cast("decimal(18,6)"))
            .otherwise(-col("value").cast("decimal(18,6)")).as("delta"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      signed
        .withColumn("s", sum("delta").over(w))
        .withColumn("low", least(lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
          min("s").over(w)))
        .select(col("event_id"), col("user_id"),
          (col("s") - col("low")).cast("double").as("balance"))
        .orderBy("event_id")
    }),

    // Seasonal decomposition (STL-lite): trend = centered 24-row
    // moving average over the hourly series, seasonal = hour-of-day
    // mean deviation from trend, residual = value − trend − seasonal.
    // Hourly aggregation first, so the windows run over the compact
    // series, not raw events; all means DECIMAL-routed.
    "ts_decompose" -> ((spark, dir) => {
      val hourly = events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg((sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("v"))
      val w = Window.orderBy("h").rowsBetween(-12, 11)
      val trended = hourly
        .withColumn("n_win", count(lit(1)).over(w))
        .withColumn("trend", sum(col("v").cast("decimal(18,6)")).over(w)
          .cast("double") / col("n_win"))
        .withColumn("hr", hour(col("h")))
      val seasonal = trended.groupBy("hr")
        .agg((sum((col("v") - col("trend")).cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("seas"))
      trended.join(broadcast(seasonal), "hr")
        .select(date_format(col("h"), "yyyy-MM-dd HH").as("h"),
          round(col("v"), 4).as("v"), round(col("trend"), 4).as("trend"),
          round(col("seas"), 4).as("seasonal"),
          round(col("v") - col("trend") - col("seas"), 4).as("residual"))
        .orderBy("h")
    }),

    // Per-group feature standardization: z-score and min-max scaling
    // of value within each event type — the feature-prep step before
    // model training. Baselines DECIMAL-derived, broadcast back.
    "feat_standardize" -> ((spark, dir) => {
      val ev = events(spark, dir)
      val base = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).as("s"),
        sum((col("value") * col("value")).cast("decimal(28,10)")).as("sq"),
        min("value").as("lo"), max("value").as("hi"))
        .select(col("event_type"),
          (col("s").cast("double") / col("n")).as("mean"),
          sqrt((col("sq").cast("double") -
            col("s").cast("double") * col("s").cast("double") / col("n")) /
            (col("n") - 1)).as("sd"),
          col("lo"), col("hi"))
      ev.join(broadcast(base), "event_type")
        .where(col("event_id") < 500)
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("mean")) / col("sd"), 6).as("z"),
          round((col("value") - col("lo")) / (col("hi") - col("lo")), 6).as("mm"))
        .orderBy("event_id")
    }),

    // DOUBLE-bounded running balance [0, 300] — the capped-inventory /
    // token-bucket recurrence. Unlike the lower-clamp-only
    // ts_clamped_balance (closed form over windows), both bounds make
    // the recurrence non-linear: this runs on the CUSTOM physical
    // operator (plans/BoundedAccumulate.scala — logical node +
    // strategy + exec with declared clustering/ordering, one shuffle).
    // The oracle replays the recurrence with a recursive CTE.
    "ts_capped_balance" -> ((spark, dir) => {
      val signed = events(spark, dir)
        .where(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "purchase", col("value"))
            .otherwise(-col("value")).as("delta"))
      graft.plans.BoundedAccumulate.boundedRunningSum(
          signed, Seq("user_id"), Seq("ts", "event_id"), "delta",
          lo = 0.0, hi = 300.0)
        .select(col("event_id"), col("user_id"), col("balance"))
        .orderBy("event_id")
    }),

    // EWMA smoothing per user on the same custom recurrence operator
    // (alpha = 0.25, exactly representable so both engines compute
    // identical IEEE steps); oracle replays via recursive CTE.
    "ts_ewma" -> ((spark, dir) => {
      graft.plans.BoundedAccumulate.ewma(
          events(spark, dir).select("user_id", "ts", "event_id", "value"),
          Seq("user_id"), Seq("ts", "event_id"), "value", alpha = 0.25)
        .select(col("event_id"), col("user_id"), col("ewma"))
        .orderBy("event_id")
    }),

    // Holt double-exponential (level + trend) smoothing per user on
    // the recurrence operator — alpha = 0.25, beta = 0.5, both exactly
    // representable; recursive-CTE oracle replays both state columns.
    "ts_holt_trend" -> ((spark, dir) => {
      graft.plans.BoundedAccumulate.holt(
          events(spark, dir).select("user_id", "ts", "event_id", "value"),
          Seq("user_id"), Seq("ts", "event_id"), "value",
          alpha = 0.25, beta = 0.5)
        .select(col("event_id"), col("user_id"), col("level"))
        .orderBy("event_id")
    }),

    // Maximum drawdown of each user's cumulative value series: peak-
    // to-date minus current, maximized — DECIMAL cumsum, running max,
    // and difference keep every step bit-exact. Two frames over one
    // per-user ordering: one sort.
    "ts_max_drawdown" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("value").cast("decimal(18,6)").as("v"))
        .withColumn("s", sum("v").over(w))
        .withColumn("peak", max(col("s")).over(w))
        .groupBy("user_id")
        .agg(max(col("peak") - col("s")).cast("double").as("max_drawdown"))
        .orderBy("user_id")
    }),

    // Row-pattern matching (operators/PatternMatch.scala): contiguous
    // signup → click+ → purchase runs per user, greedy, emitted once
    // per maximal run — MATCH_RECOGNIZE's canonical A B+ C shape via
    // gaps-and-islands windows. Oracle mirrors the construction.
    "evt_match_recognize" -> ((spark, dir) => {
      graft.operators.PatternMatch.matchABplusC(
          events(spark, dir), "user_id", Seq("ts", "event_id"), "event_id",
          isA = col("event_type") === "signup",
          isB = col("event_type") === "click",
          isC = col("event_type") === "purchase")
        .orderBy("user_id", "start_id")
    }),

    // MATCH_RECOGNIZE-lite: count per user of 3-in-a-row strictly
    // rising values (pattern A < B < C over the user's event run) —
    // the lag-composition form of the reference's sequence_count
    // (ref `gensrc/script/functions.py` sequence_match family).
    "evt_pattern_3rise" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(spark, dir)
        .withColumn("p1", lag("value", 1).over(w))
        .withColumn("p2", lag("value", 2).over(w))
        .where(col("p2").isNotNull &&
          col("p2") < col("p1") && col("p1") < col("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_rises"))
        .orderBy("user_id")
    }))

  def oracles: Map[String, String] = Map(
    "scd2_dimension" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, event_type AS attr, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |changes AS (
        |  SELECT user_id, ts, attr, event_id FROM ordered
        |  WHERE prev IS NULL OR prev <> attr)
        |SELECT user_id, attr, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM changes ORDER BY user_id, valid_from""".stripMargin,
    "scd2_point_in_time" ->
      """WITH daily AS (
        |  SELECT o_custkey, o_orderdate, max_by(o_orderpriority, o_orderkey) AS attr
        |  FROM orders GROUP BY o_custkey, o_orderdate),
        |versions AS (
        |  SELECT o_custkey, o_orderdate AS valid_from, attr FROM (
        |    SELECT o_custkey, o_orderdate, attr,
        |      lag(attr) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS prev
        |    FROM daily)
        |  WHERE prev IS NULL OR prev <> attr),
        |probes AS (
        |  SELECT o_orderkey, o_custkey,
        |    o_orderdate - INTERVAL 30 DAY AS asof_d FROM orders),
        |r AS (
        |  SELECT p.o_orderkey, p.o_custkey, v.attr,
        |    row_number() OVER (PARTITION BY p.o_orderkey
        |                       ORDER BY v.valid_from DESC) AS rn
        |  FROM probes p LEFT JOIN versions v
        |    ON p.o_custkey = v.o_custkey AND v.valid_from <= p.asof_d)
        |SELECT o_orderkey, o_custkey, attr AS prior_state
        |FROM r WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "evt_transition_matrix" ->
      """WITH pairs AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
        |  FROM events),
        |m AS (SELECT src, dst, count(*) AS n FROM pairs
        |      WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY src), 6) AS p
        |FROM m ORDER BY src, dst""".stripMargin,
    "evt_attribution_last_touch" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |ranked AS (
        |  SELECT p.event_id, t.event_type,
        |    row_number() OVER (PARTITION BY p.event_id
        |                       ORDER BY t.ts DESC, t.event_id DESC) AS rn
        |  FROM p JOIN events t
        |    ON t.user_id = p.user_id AND t.event_type <> 'purchase'
        |   AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY)
        |SELECT event_type AS touch_type, count(*) AS conversions
        |FROM ranked WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "cohort_ltv" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
        |sized AS (
        |  SELECT date_trunc('week', first_ts) AS cohort_week,
        |    count(DISTINCT user_id) AS cohort_size
        |  FROM f GROUP BY 1),
        |weekly AS (
        |  SELECT date_trunc('week', f.first_ts) AS cohort_week,
        |    CAST(date_diff('day', date_trunc('week', f.first_ts),
        |                   date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
        |    sum(CAST(e.value AS DECIMAL(18,6))) AS rev
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
        |cum AS (
        |  SELECT w.cohort_week, w.week_offset, s.cohort_size,
        |    sum(w.rev) OVER (PARTITION BY w.cohort_week ORDER BY w.week_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM weekly w JOIN sized s ON w.cohort_week = s.cohort_week)
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
        |  round(CAST(cum_rev AS DOUBLE) / cohort_size, 6) AS ltv_per_user
        |FROM cum ORDER BY cohort_week, week_offset""".stripMargin,
    "cohort_survival" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
        |m AS (
        |  SELECT date_trunc('week', f.first_ts) AS cohort_week,
        |    CAST(date_diff('day', date_trunc('week', f.first_ts),
        |                   date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
        |    count(DISTINCT e.user_id) AS active
        |  FROM events e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2),
        |x AS (
        |  SELECT cohort_week, week_offset, active,
        |    first_value(active) OVER w AS cohort_size,
        |    lag(active) OVER w AS prev_active
        |  FROM m WINDOW w AS (PARTITION BY cohort_week ORDER BY week_offset))
        |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
        |  round(CAST(active AS DOUBLE) / cohort_size, 6) AS survival,
        |  round(1.0 - CAST(active AS DOUBLE) / prev_active, 6) AS hazard
        |FROM x ORDER BY cohort_week, week_offset""".stripMargin,
    "evt_attribution_linear" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |tch AS (
        |  SELECT user_id, ts, event_type FROM events WHERE event_type <> 'purchase'),
        |j AS (
        |  SELECT p.event_id, t.event_type,
        |    count(*) OVER (PARTITION BY p.event_id) AS n_touches
        |  FROM p JOIN tch t ON t.user_id = p.user_id
        |   AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY)
        |SELECT event_type AS touch_type, count(*) AS n_touchpoints,
        |  CAST(sum(CAST(floor(1000000 / n_touches) AS BIGINT)) AS BIGINT) AS microcredits
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "evt_peak_concurrency" ->
      """WITH iv AS (
        |  SELECT event_type, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + CAST(round(value * 60000000) AS BIGINT) AS e_us
        |  FROM events),
        |deltas AS (
        |  SELECT event_type, s_us AS t, 1 AS d FROM iv
        |  UNION ALL SELECT event_type, e_us, -1 FROM iv),
        |run AS (
        |  SELECT event_type,
        |    sum(d) OVER (PARTITION BY event_type ORDER BY t, d
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS load
        |  FROM deltas)
        |SELECT event_type, CAST(max(load) AS BIGINT) AS peak FROM run
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cohort_retention_matrix" ->
      """WITH f AS (
        |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
        |SELECT date_trunc('week', f.first_ts) AS cohort_week,
        |  CAST(date_diff('day', date_trunc('week', f.first_ts),
        |                 date_trunc('week', e.ts)) / 7 AS INT) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "outlier_mad" ->
      """WITH med AS (
        |  SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, median(abs(e.value - m.med)) AS mad, any_value(m.med) AS med
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  GROUP BY e.event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(0.6745 * (e.value - d.med) / d.mad, 4) AS z
        |FROM events e JOIN mad d ON e.event_type = d.event_type
        |WHERE abs(0.6745 * (e.value - d.med) / d.mad) > 3.5
        |ORDER BY e.event_id""".stripMargin,
    "outlier_winsorize" ->
      """WITH pct AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.01) AS p01,
        |    quantile_cont(value, 0.99) AS p99
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN e.value < p.p01 OR e.value > p.p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(sum(CAST(least(greatest(e.value, p.p01), p.p99) AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*) AS winsor_mean
        |FROM events e JOIN pct p ON e.event_type = p.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "ts_seasonal_anomaly" ->
      """WITH h AS (
        |  SELECT event_id, event_type, CAST(hour(ts) AS INT) AS hr, value FROM events),
        |base AS (
        |  SELECT event_type, hr, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(28,10))) AS s,
        |    sum(CAST(value * value AS DECIMAL(28,10))) AS sq
        |  FROM h GROUP BY event_type, hr),
        |stats AS (
        |  SELECT event_type, hr,
        |    CAST(s AS DOUBLE) / n AS mean,
        |    sqrt((CAST(sq AS DOUBLE)
        |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)) AS sd
        |  FROM base)
        |SELECT h.event_id, h.event_type, h.hr, h.value,
        |  round(b.mean + 3 * b.sd, 4) AS threshold
        |FROM h JOIN stats b ON h.event_type = b.event_type AND h.hr = b.hr
        |WHERE h.value > b.mean + 3 * b.sd
        |ORDER BY h.event_id""".stripMargin,
    "evt_session_window_batch" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM g)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS s_start,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, sess ORDER BY user_id, s_start""".stripMargin,
    "evt_session_stats" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM g),
        |per AS (
        |  SELECT user_id, sess, count(*) AS n_events,
        |    (epoch_us(max(ts)) - epoch_us(min(ts))) / 60000000.0 AS duration_min
        |  FROM s GROUP BY user_id, sess)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(max(n_events) AS BIGINT) AS max_events,
        |  round(CAST(sum(CAST(duration_min AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 4) AS mean_duration_min
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,
    "evt_twap" ->
      """WITH d AS (
        |  SELECT user_id, value,
        |    (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |     - epoch_us(ts)) / 1000000.0 AS dt_s
        |  FROM events)
        |SELECT user_id,
        |  round(CAST(sum(CAST(value * dt_s AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(sum(CAST(dt_s AS DECIMAL(28,6))) AS DOUBLE), 6) AS twap
        |FROM d WHERE dt_s IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "evt_rolling_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |  count(DISTINCT u.user_id) AS wau
        |FROM days d LEFT JOIN du u
        |  ON u.day <= d.day AND u.day >= d.day - 6
        |GROUP BY d.day ORDER BY day""".stripMargin,
    "evt_heatmap" ->
      """WITH cells AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |    CAST(hour(ts) AS INT) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hr, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY dow), 6) AS day_share
        |FROM cells ORDER BY dow, hr""".stripMargin,
    "evt_stickiness" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY day),
        |mau AS (
        |  SELECT d.day, count(DISTINCT u.user_id) AS mau
        |  FROM (SELECT DISTINCT day FROM du) d JOIN du u
        |    ON u.day <= d.day AND u.day >= d.day - 29
        |  GROUP BY d.day)
        |SELECT strftime(a.day, '%Y-%m-%d') AS day, a.dau, m.mau,
        |  round(CAST(a.dau AS DOUBLE) / m.mau, 6) AS stickiness
        |FROM dau a JOIN mau m ON a.day = m.day ORDER BY day""".stripMargin,
    "ts_cusum_alarm" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |tgt AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mu
        |  FROM hourly GROUP BY 1),
        |x AS (
        |  SELECT h.event_type, h.h,
        |    CAST(h.v - t.mu - 2.0 AS DECIMAL(28,6)) AS x
        |  FROM hourly h JOIN tgt t ON h.event_type = t.event_type),
        |r1 AS (
        |  SELECT event_type, h, sum(x) OVER w AS ssum FROM x
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |r2 AS (
        |  SELECT event_type, h, ssum,
        |    CASE WHEN m < CAST(0 AS DECIMAL(38,6)) THEN m
        |         ELSE CAST(0 AS DECIMAL(38,6)) END AS low
        |  FROM (
        |    SELECT event_type, h, ssum,
        |      min(ssum) OVER (PARTITION BY event_type ORDER BY h
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        |    FROM r1))
        |SELECT event_type, strftime(h, '%Y-%m-%d %H') AS h,
        |  CAST(round(ssum - low, 6) AS DOUBLE) AS cusum
        |FROM r2 WHERE ssum - low > 15.0
        |ORDER BY event_type, h""".stripMargin,
    "evt_error_burst" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
        |w AS (
        |  SELECT event_id, user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY ts
        |      RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
        |      AS burst_n
        |  FROM e)
        |SELECT event_id, user_id, burst_n FROM w
        |WHERE burst_n >= 3 ORDER BY event_id""".stripMargin,
    "evt_since_last_reset" ->
      """WITH seg AS (
        |  SELECT event_id, user_id, ts,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
        |  FROM events)
        |SELECT event_id,
        |  CAST(row_number() OVER (PARTITION BY user_id, seg
        |                          ORDER BY ts, event_id) - 1 AS BIGINT) AS n_since
        |FROM seg ORDER BY event_id""".stripMargin,
    "evt_new_vs_returning" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS first_d
        |  FROM events GROUP BY user_id),
        |d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(sum(CASE WHEN day = f.first_d THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN day = f.first_d THEN 0 ELSE 1 END) AS BIGINT) AS n_returning
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY day ORDER BY day""".stripMargin,
    "evt_top_paths" ->
      """WITH l AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events),
        |c AS (
        |  SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |  FROM l WHERE e3 IS NOT NULL GROUP BY 1)
        |SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "evt_time_to_event" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS su_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |pu AS (
        |  SELECT e.user_id, min(e.ts) AS pu_ts
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.su_ts
        |  GROUP BY e.user_id),
        |lastev AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
        |SELECT su.user_id,
        |  round((epoch_us(coalesce(pu.pu_ts, l.last_ts)) - epoch_us(su.su_ts))
        |    / 3600000000.0, 6) AS duration_h,
        |  pu.pu_ts IS NOT NULL AS converted
        |FROM su LEFT JOIN pu ON su.user_id = pu.user_id
        |JOIN lastev l ON su.user_id = l.user_id
        |ORDER BY su.user_id""".stripMargin,
    "funnel_time_percentiles" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS su_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |pu AS (
        |  SELECT e.user_id, min(e.ts) AS pu_ts, any_value(su.su_ts) AS su_ts
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.su_ts
        |  GROUP BY e.user_id),
        |lags AS (
        |  SELECT date_trunc('month', su_ts) AS cohort_month,
        |    (epoch_us(pu_ts) - epoch_us(su_ts)) / 3600000000.0 AS lag_hours
        |  FROM pu)
        |SELECT cohort_month, count(*) AS n_converted,
        |  round(quantile_cont(lag_hours, 0.5), 4) AS median_hours,
        |  round(quantile_cont(lag_hours, 0.9), 4) AS p90_hours
        |FROM lags GROUP BY cohort_month ORDER BY cohort_month""".stripMargin,
    "ts_clamped_balance" ->
      """WITH signed AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6))
        |         ELSE -CAST(value AS DECIMAL(18,6)) END AS delta
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |r1 AS (
        |  SELECT event_id, user_id, ts,
        |    sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM signed),
        |r2 AS (
        |  SELECT event_id, user_id, s, CASE WHEN m < CAST(0 AS DECIMAL(38,6))
        |    THEN m ELSE CAST(0 AS DECIMAL(38,6)) END AS low
        |  FROM (
        |    SELECT event_id, user_id, s,
        |      min(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        |    FROM r1))
        |SELECT event_id, user_id, CAST(s - low AS DOUBLE) AS balance
        |FROM r2 ORDER BY event_id""".stripMargin,
    "ts_decompose" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS v
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT h, v,
        |    CAST(sum(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
        |      / count(*) OVER w AS trend,
        |    CAST(hour(h) AS INT) AS hr
        |  FROM hourly
        |  WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
        |s AS (
        |  SELECT hr,
        |    CAST(sum(CAST(v - trend AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS seas
        |  FROM t GROUP BY hr)
        |SELECT strftime(t.h, '%Y-%m-%d %H') AS h,
        |  round(v, 4) AS v, round(trend, 4) AS trend,
        |  round(seas, 4) AS seasonal,
        |  round(v - trend - seas, 4) AS residual
        |FROM t JOIN s ON t.hr = s.hr ORDER BY h""".stripMargin,
    "feat_standardize" ->
      """WITH base AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(28,10))) AS s,
        |    sum(CAST(value * value AS DECIMAL(28,10))) AS sq,
        |    min(value) AS lo, max(value) AS hi
        |  FROM events GROUP BY event_type),
        |st AS (
        |  SELECT event_type,
        |    CAST(s AS DOUBLE) / n AS mean,
        |    sqrt((CAST(sq AS DOUBLE)
        |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)) AS sd,
        |    lo, hi
        |  FROM base)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - b.mean) / b.sd, 6) AS z,
        |  round((e.value - b.lo) / (b.hi - b.lo), 6) AS mm
        |FROM events e JOIN st b ON e.event_type = b.event_type
        |WHERE e.event_id < 500 ORDER BY e.event_id""".stripMargin,
    "ts_capped_balance" ->
      """WITH RECURSIVE sgn AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_type = 'purchase' THEN value ELSE -value END AS delta,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |r AS (
        |  SELECT user_id, event_id, rn,
        |    least(300.0, greatest(0.0, delta)) AS bal
        |  FROM sgn WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.event_id, s.rn,
        |    least(300.0, greatest(0.0, r.bal + s.delta))
        |  FROM sgn s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT event_id, user_id, bal AS balance FROM r
        |ORDER BY event_id""".stripMargin,
    "ts_ewma" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, rn, value AS ewma FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.event_id, s.rn,
        |    0.25 * s.value + 0.75 * r.ewma
        |  FROM o s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT event_id, user_id, ewma FROM r ORDER BY event_id""".stripMargin,
    "ts_holt_trend" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, event_id, rn, value AS lvl, CAST(0 AS DOUBLE) AS tr
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.event_id, s.rn,
        |    0.25 * s.value + 0.75 * (r.lvl + r.tr),
        |    0.5 * ((0.25 * s.value + 0.75 * (r.lvl + r.tr)) - r.lvl) + 0.5 * r.tr
        |  FROM o s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        |SELECT event_id, user_id, lvl AS level FROM r
        |ORDER BY event_id""".stripMargin,
    "ts_max_drawdown" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    sum(CAST(value AS DECIMAL(18,6))) OVER w AS s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (
        |  SELECT user_id, s,
        |    max(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM s)
        |SELECT user_id, CAST(max(peak - s) AS DOUBLE) AS max_drawdown
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,
    "evt_match_recognize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE event_type WHEN 'signup' THEN 'A' WHEN 'click' THEN 'B'
        |      WHEN 'purchase' THEN 'C' ELSE 'X' END AS lbl
        |  FROM events),
        |l AS (
        |  SELECT user_id, event_id, lbl,
        |    row_number() OVER w AS rn,
        |    lag(lbl) OVER w AS plbl, lag(event_id) OVER w AS pid,
        |    lead(lbl) OVER w AS nlbl, lead(event_id) OVER w AS nid
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |b AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
        |  FROM l WHERE lbl = 'B'),
        |runs AS (
        |  SELECT user_id, isl, count(*) AS n_b,
        |    min_by(pid, rn) AS start_id, max_by(nid, rn) AS end_id,
        |    min_by(plbl, rn) AS fl, max_by(nlbl, rn) AS ll
        |  FROM b GROUP BY user_id, isl)
        |SELECT user_id, start_id, end_id, n_b FROM runs
        |WHERE fl = 'A' AND ll = 'C'
        |ORDER BY user_id, start_id""".stripMargin,
    "evt_pattern_3rise" ->
      """WITH lagged AS (
        |  SELECT user_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
        |    lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
        |  FROM events)
        |SELECT user_id, count(*) AS n_rises FROM lagged
        |WHERE p2 IS NOT NULL AND p2 < p1 AND p1 < value
        |GROUP BY user_id ORDER BY user_id""".stripMargin)
}
