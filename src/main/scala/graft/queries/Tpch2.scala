package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The rest of the TPC-H suite (Q2..Q22), shape-preserving adaptations.
  *
  * The synthetic star schema (TESTDATA.md) lacks partsupp,
  * commit/receipt dates, shipmode/container/phone — so each query
  * keeps its reference plan SHAPE (the thing that matters at scale:
  * correlated-subquery decorrelation, semi/anti joins, double EXISTS,
  * scalar-subquery guards, conditional aggregation — golden plans in
  * `fe/fe-core/src/test/resources/sql/tpch/`) while substituting
  * available columns. Date windows sit inside the data's actual
  * 1995–2001 range so every query selects real rows.
  *
  * Float determinism: money sums pass through DECIMAL(18,6) on both
  * the Spark and DuckDB side (see Tpch.scala).
  */
object Tpch2 extends graft.QueryArea {

  private def dsum(c: Column) = sum(c.cast("decimal(18,6)")).cast("double")
  private def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private def ts(s: String) = lit(s).cast("timestamp")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2 shape: correlated max-subquery over a multi-join (min-cost
    // supplier → here: best-acctbal supplier that shipped the part).
    "q2_best_supplier" -> ((spark, dir) => {
      val parts = Tables.load(spark, dir, "part")
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
      val nation = Tables.load(spark, dir, "nation")
      val region = Tables.load(spark, dir, "region").filter(col("r_name") === "EUROPE")
      val supp = Tables.load(spark, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      val shipped = Tables.load(spark, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_type"), col("s_name"), col("s_acctbal"), col("n_name"))
        .distinct()
      val best = shipped.groupBy(col("p_partkey").as("bp")).agg(max(col("s_acctbal")).as("max_bal"))
      shipped.join(broadcast(best),
          col("p_partkey") === col("bp") && col("s_acctbal") === col("max_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_type"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),
    // Q4 shape: EXISTS → semi join, count by priority (late shipment
    // stands in for commitdate < receiptdate).
    "q4_order_priority" -> ((spark, dir) => {
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") && col("o_orderdate") < ts("1996-10-01"))
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),
    // Q7 shape: bidirectional nation-pair volume by year.
    "q7_volume_shipping" -> ((spark, dir) => {
      val nation = Tables.load(spark, dir, "nation")
      val supp = Tables.load(spark, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"), col("s_nationkey"))
      val cust = Tables.load(spark, dir, "customer")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"), col("c_nationkey"))
      val ord = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("s_nationkey") >= 13 && col("c_nationkey") < 13) ||
          (col("s_nationkey") < 13 && col("c_nationkey") >= 13))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),
    // Q8 shape: market share of one supplier-nation group per year.
    "q8_market_share" -> ((spark, dir) => {
      val nation = Tables.load(spark, dir, "nation")
      val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
      val cust = Tables.load(spark, dir, "customer")
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val parts = Tables.load(spark, dir, "part").filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val supp = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      Tables.load(spark, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          dsum(when(col("s_nationkey") < 13, rev).otherwise(lit(0))) / dsum(rev),
          6).as("mkt_share"))
        .orderBy(col("o_year"))
    }),
    // Q9 shape: profit by supplier nation × year (retailprice-based
    // cost stands in for ps_supplycost).
    "q9_product_profit" -> ((spark, dir) => {
      val parts = Tables.load(spark, dir, "part")
        .filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val nation = Tables.load(spark, dir, "nation")
      val supp = Tables.load(spark, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val ord = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      Tables.load(spark, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(dsum(rev - col("p_retailprice") * col("l_quantity") * lit(0.1)).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),
    // Q11 shape: group-HAVING against a scalar subquery over the same
    // aggregation (important stock → high-value parts).
    "q11_important_parts" -> ((spark, dir) => {
      val supp = Tables.load(spark, dir, "supplier")
        .filter(col("s_nationkey") < 13).select(col("s_suppkey"))
      val value = Tables.load(spark, dir, "lineitem")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(dsum(rev).as("part_value"))
      // scale-free threshold (the spec's fixed fraction collapses as
      // part count grows with SF): keep parts above 1.2× the mean
      val threshold = value.agg(
        (dsum(col("part_value")) / count(lit(1)) * lit(1.2)).as("thr"))
      value.join(broadcast(threshold))
        .filter(col("part_value") > col("thr"))
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),
    // Q12 shape: join + conditional two-way counts (linestatus stands
    // in for shipmode; 60-day ship delay for the receipt-late check).
    "q12_late_lines" -> ((spark, dir) => {
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(hi && late, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi && late, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),
    // Q13 shape: left outer join + two-level aggregation (customer
    // order-count distribution).
    "q13_customer_distribution" -> ((spark, dir) => {
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.load(spark, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    // Q14 shape: conditional revenue ratio (promo share in a month).
    "q14_promo_revenue" -> ((spark, dir) => {
      val parts = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_type"))
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01") && col("l_shipdate") < ts("1996-10-01"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100) *
          dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))) / dsum(rev),
          6).as("promo_revenue"))
    }),
    // Q15 shape: scalar-subquery max against a derived revenue view.
    "q15_top_supplier" -> ((spark, dir) => {
      val revenue = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(rev).as("total_revenue"))
      val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
      Tables.load(spark, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),
    // Q16 shape: NOT-IN anti join + count-distinct by part attributes.
    "q16_part_supplier_count" -> ((spark, dir) => {
      val badSupp = Tables.load(spark, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_suppkey"))
      val parts = Tables.load(spark, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "STANDARD" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45))
      Tables.load(spark, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("bad_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),
    // Q17 shape: correlated per-part AVG subquery guarding a sum.
    "q17_small_quantity_revenue" -> ((spark, dir) => {
      val parts = Tables.load(spark, dir, "part")
        .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
      val li = Tables.load(spark, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("l_partkey").as("ap"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(broadcast(avgQty), col("l_partkey") === col("ap"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(round(dsum(col("l_extendedprice")) / 7.0, 6).as("avg_yearly"))
    }),
    // Q19 shape: disjunctive multi-attribute predicates over an
    // equi-join (stays a hash join; OR evaluated as post-filter).
    "q19_disjunctive_revenue" -> ((spark, dir) => {
      val parts = Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      Tables.load(spark, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) && col("l_quantity").between(1, 15)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 25) && col("l_quantity").between(10, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 40) && col("l_quantity").between(20, 35)))
        .agg(dsum(rev).as("revenue"))
    }),
    // Q20 shape: nested semi join through an agg-HAVING subquery.
    "q20_supplier_candidates" -> ((spark, dir) => {
      val parts = Tables.load(spark, dir, "part")
        .filter(col("p_name").like("%widget%")).select(col("p_partkey"))
      val shippers = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 50)
        .select(col("l_suppkey"))
      Tables.load(spark, dir, "supplier")
        .filter(col("s_nationkey") < 13)
        .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),
    // Q21 shape: EXISTS + NOT-EXISTS double correlation (suppliers who
    // alone were late on multi-supplier orders).
    "q21_waiting_supplier" -> ((spark, dir) => {
      val ord = Tables.load(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val base = Tables.load(spark, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")).as("late"))
      val nation = Tables.load(spark, dir, "nation")
      val supp = Tables.load(spark, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .filter(col("s_nationkey") >= 13)
        .select(col("s_suppkey"), col("s_name"))
      val others = base.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"), col("late").as("late2"))
      base.filter(col("late"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(others, col("o2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"), "left_semi")
        .join(others.filter(col("late2")),
          col("o2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),
    // Q22 shape: scalar-avg subquery + anti join (customers above
    // average balance with no recent orders; nation key stands in for
    // the phone country code).
    "q22_sales_opportunity" -> ((spark, dir) => {
      val cust = Tables.load(spark, dir, "customer").filter(col("c_nationkey") < 7)
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,6)")) / count(lit(1)))
          .cast("double").as("avg_bal"))
      val recent = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= ts("2001-01-01"))
        .select(col("o_custkey"))
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }))

  def oracles: Map[String, String] = Map(
    "q2_best_supplier" ->
      """WITH shipped AS (
        |  SELECT DISTINCT p_partkey, p_type, s_name, s_acctbal, n_name
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type FROM shipped s
        |WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM shipped s2 WHERE s2.p_partkey = s.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((s_nationkey >= 13 AND c_nationkey < 13) OR (s_nationkey < 13 AND c_nationkey >= 13))
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(
        |    CAST(SUM(CAST(CASE WHEN s_nationkey < 13 THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        |    6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH value AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS part_value
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey < 13 GROUP BY l_partkey)
        |SELECT l_partkey, part_value FROM value
        |WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1.2 FROM value)
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q12_late_lines" ->
      """SELECT l_linestatus,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT round(100 *
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
        |  6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_part_supplier_count" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'STANDARD'
        |  AND p_size IN (1,5,10,15,20,25,30,35,40,45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_quantity_revenue" ->
      """SELECT round(
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 35)""".stripMargin,
    "q20_supplier_candidates" ->
      """SELECT s_name, s_acctbal FROM supplier
        |WHERE s_nationkey < 13 AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%widget%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
        |ORDER BY s_name""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_suppkey,
        |    (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM base l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_nationkey >= 13 AND l1.late
        |  AND EXISTS (SELECT 1 FROM base l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM base l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q22_sales_opportunity" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_nationkey < 7
        |  AND c_acctbal > (
        |    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) / count(*) AS DOUBLE)
        |    FROM customer c2 WHERE c2.c_acctbal > 0 AND c2.c_nationkey < 7)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
