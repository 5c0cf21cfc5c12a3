package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import util._

/** Event-time windowing surface, run in batch so the driver's DuckDB
  * oracle applies — the *same* Column transforms run as Structured
  * Streaming in `graft.streaming.Streams` (exercised with
  * Trigger.AvailableNow in StreamingSpec). Reference anchor:
  * time_slice/date_trunc windows + routine-load ingest
  * (SURVEY.md §2.10).
  */
object StreamingQ extends graft.QueryArea {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling_window" -> ((spark, dir) => {
      graft.streaming.Streams.tumblingAgg(t(spark, dir, "events"))
        .orderBy(col("wstart"), col("event_type"))
    }),
    "stream_sliding_window" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      e.groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("event_type"), col("n"))
        .orderBy(col("wstart"), col("event_type"))
    }),
    "stream_session_window" -> ((spark, dir) => {
      graft.streaming.Streams.sessionAgg(t(spark, dir, "events"))
        .orderBy(col("user_id"), col("sstart"))
    }))

  def oracles: Map[String, String] = Map(
    "stream_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS wstart, event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    "stream_sliding_window" ->
      """WITH offs AS (SELECT unnest([0, 1]) AS o)
        |SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS wstart, event_type, count(*) AS n
        |FROM events, offs
        |GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    // session windows: gap > 30 min starts a new session; mirrors the
    // lag/running-sum formulation
    "stream_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
        |         THEN 1 ELSE 0 END AS gap
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT CAST(min(ts) AS TIMESTAMP) AS sstart,
        |  CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS send,
        |  user_id, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, sid ORDER BY user_id, sstart""".stripMargin)
}
