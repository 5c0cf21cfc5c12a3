package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import util._

/** ClickBench-style web-analytics flight over the `events` table.
  *
  * The reference runs ClickBench alongside TPC-H/TPC-DS/SSB as a
  * first-class workload (docs/en/release_notes/release-3.3.md cites
  * ClickBench results; benchmarking docs ship the others). ClickBench's
  * `hits` queries are single wide-table scan-heavy aggregations:
  * global counts, count-distinct of users, top-N group-bys, LIKE /
  * regexp scans, per-minute time buckets, order-by-limit rows. This
  * flight maps those shapes onto `events(event_id, ts, user_id,
  * event_type, value, props)` — user_id ≡ UserID, the JSON `props.k`
  * ≡ RegionID, event_type ≡ SearchPhrase-ish category, value ≡ the
  * numeric metric.
  *
  * Scale shape: every query is a single scan of the fact with at most
  * ONE shuffle (the group-by); top-Ns fuse into
  * TakeOrderedAndProject; no joins at all — the 100 TB cost model is
  * scan bandwidth, which is exactly what ClickBench measures. All
  * top-N orderings carry explicit tiebreakers so results are
  * deterministic under ties (oracle-hash-stable).
  */
object ClickBench extends graft.QueryArea {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")

  /** props is a JSON object like {"k": 69}; k plays RegionID. */
  private val kCol = get_json_object(col("props"), "$.k").cast("int")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q0 shape: SELECT COUNT(*) — pure scan floor
    "cb_count" -> ((spark, dir) =>
      ev(spark, dir).agg(count(lit(1)).as("n"))),

    // Q1-Q3 shape: filtered global aggregate over several kernels
    "cb_filtered_agg" -> ((spark, dir) =>
      ev(spark, dir).filter(col("event_type") =!= "view")
        .agg(count(lit(1)).as("n"),
          round(dsum(col("value")), 4).as("sum_v"),
          round(avg(col("value")), 4).as("avg_v"))),

    // Q4-Q5 shape: COUNT(DISTINCT ...) — exact, two-phase
    "cb_uniq_users" -> ((spark, dir) =>
      ev(spark, dir).agg(
        countDistinct(col("user_id")).as("u"),
        countDistinct(col("event_type")).as("et"))),

    // Q6 shape: global min/max
    "cb_minmax_ts" -> ((spark, dir) =>
      ev(spark, dir).agg(
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"))),

    // Q7 shape: GROUP BY low-card key ORDER BY count DESC
    "cb_group_count" -> ((spark, dir) =>
      ev(spark, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"))),

    // Q8-Q9 shape: top-10 regions by distinct users
    "cb_topk_regions" -> ((spark, dir) =>
      ev(spark, dir).select(kCol.as("k"), col("user_id"))
        .groupBy(col("k"))
        .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n"))
        .orderBy(col("u").desc, col("k"))
        .limit(10)),

    // Q15-Q17 shape: top-10 users by event count
    "cb_top_users" -> ((spark, dir) =>
      ev(spark, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(dsum(col("value")), 4).as("sum_v"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(10)),

    // Q18 shape: user × minute buckets, top-10
    "cb_user_minute" -> ((spark, dir) =>
      ev(spark, dir)
        .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("m"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id"), col("m"))
        .limit(10)),

    // Q20-Q22 shape: LIKE scan then aggregate
    "cb_like_scan" -> ((spark, dir) =>
      ev(spark, dir).filter(col("event_type").like("%ic%"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("min_v"),
          round(max(col("value")), 4).as("max_v"))
        .orderBy(col("event_type"))),

    // Q29 shape: many aggregates over a derived bucket key
    "cb_multi_agg" -> ((spark, dir) =>
      ev(spark, dir).select((kCol % 10).as("kb"), col("user_id"), col("value"))
        .groupBy(col("kb"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("value")), 4).as("sum_v"),
          round(avg(col("value")), 4).as("avg_v"),
          countDistinct(col("user_id")).as("u"))
        .orderBy(col("kb"))),

    // Q23-Q27 shape: filter, ORDER BY, LIMIT raw rows
    "cb_order_limit" -> ((spark, dir) =>
      ev(spark, dir).filter(col("value") > 15)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("ts"), col("event_id"))
        .limit(10)),

    // Q28 shape: regexp extraction then top-10 group
    "cb_regex_topk" -> ((spark, dir) =>
      ev(spark, dir)
        .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("kstr"))
        .groupBy(col("kstr"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("kstr"))
        .limit(10)),

    // quantiles of the metric per category (shared percentile state)
    "cb_quantiles" -> ((spark, dir) =>
      ev(spark, dir).groupBy(col("event_type"))
        .agg(expr("percentile(value, array(0.5d, 0.95d))").as("ps"))
        .select(col("event_type"),
          round(col("ps")(0), 4).as("p50"),
          round(col("ps")(1), 4).as("p95"))
        .orderBy(col("event_type"))),

    // Q43-ish shape: time histogram (hour-of-day profile)
    "cb_hourly_profile" -> ((spark, dir) =>
      ev(spark, dir).groupBy(hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
        .orderBy(col("h"))),

    // Q14 shape: two-column group, top-10 by count
    "cb_pair_topk" -> ((spark, dir) =>
      ev(spark, dir).select(col("event_type"), kCol.as("k"))
        .groupBy(col("event_type"), col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"), col("k"))
        .limit(10)),

    // Q19 shape: point lookup on the primary dimension
    "cb_point_lookup" -> ((spark, dir) =>
      ev(spark, dir).filter(col("user_id") === 42)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .orderBy(col("event_id"))),

    // Q24 shape: raw rows ordered by a string column
    "cb_string_sort" -> ((spark, dir) =>
      ev(spark, dir)
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_type"), col("props"), col("event_id"))
        .limit(10)),

    // HAVING shape: only groups above a size threshold
    "cb_having" -> ((spark, dir) =>
      ev(spark, dir).select(kCol.as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 110)
        .orderBy(col("n").desc, col("k"))),

    // Q41-43 shape: per-day series under a date-range filter
    "cb_daily_series" -> ((spark, dir) =>
      ev(spark, dir)
        .filter(col("ts") >= ts("2024-01-05") && col("ts") < ts("2024-01-15"))
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("value")), 4).as("sum_v"))
        .orderBy(col("d"))),

    // Q10-11 shape: LIKE filter + distinct users per region, top-10
    "cb_like_uniq" -> ((spark, dir) =>
      ev(spark, dir).filter(col("event_type").like("p%"))
        .select(kCol.as("k"), col("user_id"))
        .groupBy(col("k"))
        .agg(countDistinct(col("user_id")).as("u"))
        .orderBy(col("u").desc, col("k"))
        .limit(10)),

    // banded metric distribution (CASE bands; Q13-ish)
    "cb_value_bands" -> ((spark, dir) =>
      ev(spark, dir).select(
          when(col("value") < 5, "lo").when(col("value") < 15, "mid")
            .otherwise("hi").as("band"))
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .orderBy(col("band"))),

    // Q32-34 shape: rank groups by a second metric
    "cb_two_metrics" -> ((spark, dir) =>
      ev(spark, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(dsum(col("value")), 4).as("sum_v"))
        .orderBy(col("sum_v").desc, col("user_id"))
        .limit(10)))

  def oracles: Map[String, String] = Map(
    "cb_count" -> "SELECT count(*) AS n FROM events",
    "cb_filtered_agg" ->
      """SELECT count(*) AS n,
        |  round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS sum_v,
        |  round(avg(value), 4) AS avg_v
        |FROM events WHERE event_type <> 'view'""".stripMargin,
    "cb_uniq_users" ->
      """SELECT count(DISTINCT user_id) AS u, count(DISTINCT event_type) AS et
        |FROM events""".stripMargin,
    "cb_minmax_ts" ->
      """SELECT min(ts) AS first_ts, max(ts) AS last_ts,
        |  round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
        |FROM events""".stripMargin,
    "cb_group_count" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin,
    "cb_topk_regions" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(DISTINCT user_id) AS u, count(*) AS n
        |FROM events GROUP BY k ORDER BY u DESC, k LIMIT 10""".stripMargin,
    "cb_top_users" ->
      """SELECT user_id, count(*) AS n,
        |  round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS sum_v
        |FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""".stripMargin,
    "cb_user_minute" ->
      """SELECT user_id, date_trunc('minute', ts) AS m, count(*) AS n
        |FROM events GROUP BY user_id, m
        |ORDER BY n DESC, user_id, m LIMIT 10""".stripMargin,
    "cb_like_scan" ->
      """SELECT event_type, count(*) AS n,
        |  round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
        |FROM events WHERE event_type LIKE '%ic%'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cb_multi_agg" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS kb,
        |  count(*) AS n,
        |  round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS sum_v,
        |  round(avg(value), 4) AS avg_v,
        |  count(DISTINCT user_id) AS u
        |FROM events GROUP BY kb ORDER BY kb""".stripMargin,
    "cb_order_limit" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE value > 15 ORDER BY ts, event_id LIMIT 10""".stripMargin,
    "cb_regex_topk" ->
      """SELECT regexp_extract(props, '"k": (\d+)', 1) AS kstr, count(*) AS n
        |FROM events GROUP BY kstr ORDER BY n DESC, kstr LIMIT 10""".stripMargin,
    "cb_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cb_hourly_profile" ->
      """SELECT hour(ts) AS h, count(*) AS n, count(DISTINCT user_id) AS u
        |FROM events GROUP BY h ORDER BY h""".stripMargin,
    "cb_pair_topk" ->
      """SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
        |FROM events GROUP BY event_type, k
        |ORDER BY n DESC, event_type, k LIMIT 10""".stripMargin,
    "cb_point_lookup" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE user_id = 42 ORDER BY event_id""".stripMargin,
    "cb_string_sort" ->
      """SELECT event_id, event_type, props FROM events
        |ORDER BY event_type, props, event_id LIMIT 10""".stripMargin,
    "cb_having" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
        |FROM events GROUP BY k HAVING count(*) > 110
        |ORDER BY n DESC, k""".stripMargin,
    "cb_daily_series" ->
      """SELECT date_trunc('day', ts) AS d, count(*) AS n,
        |  round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS sum_v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
        |GROUP BY d ORDER BY d""".stripMargin,
    "cb_like_uniq" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  count(DISTINCT user_id) AS u
        |FROM events WHERE event_type LIKE 'p%'
        |GROUP BY k ORDER BY u DESC, k LIMIT 10""".stripMargin,
    "cb_value_bands" ->
      """SELECT CASE WHEN value < 5 THEN 'lo' WHEN value < 15 THEN 'mid'
        |  ELSE 'hi' END AS band, count(*) AS n
        |FROM events GROUP BY band ORDER BY band""".stripMargin,
    "cb_two_metrics" ->
      """SELECT user_id, count(*) AS n,
        |  round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS sum_v
        |FROM events GROUP BY user_id ORDER BY sum_v DESC, user_id LIMIT 10""".stripMargin)
}
