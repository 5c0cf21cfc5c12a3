package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import util._

/** TPC-DS-mechanics flight — the reference ships the full TPC-DS 99
  * (`docs/en/benchmarking/TPC_DS_Benchmark.md`,
  * `docs/en/benchmarking/tpc_ds_99_sql.md`; FE golden plans under
  * `fe/fe-core/src/test/resources/sql/tpcds/`). The TPC-DS *schema*
  * (store_sales/web_sales/…) isn't in the testdata, so this flight
  * reproduces the query MECHANICS that distinguish TPC-DS from TPC-H
  * on the tables we have, one gate per mechanic:
  *
  *  - rollup + GROUPING() indicators + rank within each grouping
  *    level (Q27/Q36 lochierarchy pattern)
  *  - multi-channel UNION ALL re-aggregated to one metric (Q33/Q56/
  *    Q60; return-flag classes play the channels)
  *  - INTERSECT of customer sets across consecutive years (Q38)
  *  - correlated "above 1.2x the group average" filter (Q1/Q30)
  *  - FULL OUTER channel overlap with COALESCE'd keys (Q97)
  *
  * Scale shape: every query is fact-side single-shuffle per agg;
  * UNION ALL branches share the scan via Spark's plan reuse;
  * rollup's Expand doubles rows map-side only (no extra shuffle);
  * INTERSECT hashes on the already-aggregated customer sets.
  */
object TpcdsFlavor extends graft.QueryArea {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q27/Q36: rollup with grouping-level indicator + rank inside level
    "tpcds_rollup_rank" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH agg AS (
        |  SELECT l_returnflag, l_linestatus,
        |    GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lochierarchy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM lineitem
        |  GROUP BY ROLLUP(l_returnflag, l_linestatus))
        |SELECT lochierarchy, l_returnflag, l_linestatus, round(revenue, 2) AS revenue,
        |  RANK() OVER (PARTITION BY lochierarchy,
        |    CASE WHEN lochierarchy = 1 THEN l_returnflag END
        |    ORDER BY revenue DESC) AS rank_within
        |FROM agg
        |ORDER BY lochierarchy DESC, l_returnflag, l_linestatus""".stripMargin)),

    // Q33/Q56/Q60: per-channel aggregates unioned then re-aggregated
    "tpcds_channel_union" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH ship AS (
        |  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey
        |  UNION ALL
        |  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |  FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey
        |  UNION ALL
        |  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
        |SELECT p_brand, round(SUM(rev), 2) AS total_rev
        |FROM ship JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY total_rev DESC, p_brand LIMIT 20""".stripMargin)),

    // Q38: customers active in BOTH years (INTERSECT), counted
    "tpcds_repeat_customers" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT COUNT(*) AS n_repeat FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)""".stripMargin)),

    // Q1/Q30: orders above 1.2x their clerk-group average
    "tpcds_above_avg" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH tot AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders)
        |SELECT t.o_orderkey, t.o_custkey, round(t.o_totalprice, 2) AS price
        |FROM tot t
        |WHERE t.o_totalprice > (
        |  SELECT 1.2 * AVG(o_totalprice) FROM tot t2
        |  WHERE t2.o_orderpriority = t.o_orderpriority)
        |ORDER BY t.o_orderkey LIMIT 100""".stripMargin)),

    // Q97: two-channel overlap via FULL OUTER + COALESCE
    "tpcds_channel_overlap" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH air AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
        |rail AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'N')
        |SELECT
        |  SUM(CASE WHEN a.l_partkey IS NOT NULL AND r.l_partkey IS NULL THEN 1 ELSE 0 END) AS air_only,
        |  SUM(CASE WHEN a.l_partkey IS NULL AND r.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS rail_only,
        |  SUM(CASE WHEN a.l_partkey IS NOT NULL AND r.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS both_ch
        |FROM air a FULL OUTER JOIN rail r
        |  ON a.l_partkey = r.l_partkey AND a.l_suppkey = r.l_suppkey""".stripMargin)))

  def oracles: Map[String, String] = Map(
    "tpcds_rollup_rank" ->
      """WITH agg AS (
        |  SELECT l_returnflag, l_linestatus,
        |    GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lochierarchy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |  FROM lineitem
        |  GROUP BY ROLLUP(l_returnflag, l_linestatus))
        |SELECT lochierarchy, l_returnflag, l_linestatus, round(revenue, 2) AS revenue,
        |  RANK() OVER (PARTITION BY lochierarchy,
        |    CASE WHEN lochierarchy = 1 THEN l_returnflag END
        |    ORDER BY revenue DESC) AS rank_within
        |FROM agg
        |ORDER BY lochierarchy DESC, l_returnflag, l_linestatus""".stripMargin,
    "tpcds_channel_union" ->
      """WITH ship AS (
        |  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey
        |  UNION ALL
        |  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |  FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey
        |  UNION ALL
        |  SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
        |SELECT p_brand, round(SUM(rev), 2) AS total_rev
        |FROM ship JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY total_rev DESC, p_brand LIMIT 20""".stripMargin,
    "tpcds_repeat_customers" ->
      """SELECT COUNT(*) AS n_repeat FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)""".stripMargin,
    "tpcds_above_avg" ->
      """WITH tot AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders)
        |SELECT t.o_orderkey, t.o_custkey, round(t.o_totalprice, 2) AS price
        |FROM tot t
        |WHERE t.o_totalprice > (
        |  SELECT 1.2 * AVG(o_totalprice) FROM tot t2
        |  WHERE t2.o_orderpriority = t.o_orderpriority)
        |ORDER BY t.o_orderkey LIMIT 100""".stripMargin,
    "tpcds_channel_overlap" ->
      """WITH air AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
        |rail AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'N')
        |SELECT
        |  CAST(SUM(CASE WHEN a.l_partkey IS NOT NULL AND r.l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS air_only,
        |  CAST(SUM(CASE WHEN a.l_partkey IS NULL AND r.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rail_only,
        |  CAST(SUM(CASE WHEN a.l_partkey IS NOT NULL AND r.l_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_ch
        |FROM air a FULL OUTER JOIN rail r
        |  ON a.l_partkey = r.l_partkey AND a.l_suppkey = r.l_suppkey""".stripMargin)
}
