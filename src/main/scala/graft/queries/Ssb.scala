package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import util._

/** SSB (Star Schema Benchmark) flight of 13 queries, adapted to the
  * TPC-H-shaped testdata the way the reference ships SSB alongside
  * TPC-H (`docs/en/benchmarking/SSB_Benchmarking.md`; FE golden plans
  * under `fe/fe-core/src/test/resources/sql/`). The SSB "lineorder"
  * flat fact is lineitem⋈orders here; dims are part / supplier /
  * customer, each widened with nation→region names. Substitutions for
  * columns the testdata lacks: p_category ≡ first word of p_type,
  * city-level groups ≡ nation-level, supplycost ≡ 0.5·p_retailprice·
  * l_quantity.
  *
  * Scale shape: ONE fact-fact shuffle (lineitem⋈orders on orderkey —
  * AQE/SMJ territory at 100 TB); every dim side is filtered first and
  * broadcast, so flight Q2-Q4 add zero extra shuffles before the
  * final group-by. Money sums go through DECIMAL(18,6) (order-exact,
  * oracle-stable).
  */
object Ssb extends graft.QueryArea {

  private def fact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").join(t(spark, dir, "orders"),
      col("l_orderkey") === col("o_orderkey"))
      .withColumn("d_year", year(col("o_orderdate")).cast("int"))

  /** supplier ⋈ nation ⋈ region → (s_suppkey, s_nation, s_region). */
  private def suppDim(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name").as("s_nation"), col("r_name").as("s_region"))

  private def custDim(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name").as("c_nation"), col("r_name").as("c_region"))

  private def partDim(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").withColumn("p_category", split(col("p_type"), " ")(0))

  private val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val profit = rev - lit(0.5) * col("p_retailprice") * col("l_quantity")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flight 1: revenue gained from discount bands (TPC-H Q6 shape;
    // no dims — filter + global agg, zero extra shuffles)
    "ssb_q1_1" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("d_year") === 1996 &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 25)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))),
    "ssb_q1_2" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-02-01") &&
          col("l_discount").between(0.06, 0.08) && col("l_quantity").between(26, 35))
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))),
    "ssb_q1_3" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("o_orderdate") >= ts("1996-02-01") && col("o_orderdate") < ts("1996-02-08") &&
          col("l_discount").between(0.08, 0.10) && col("l_quantity").between(36, 40))
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))),
    // ---- flight 2: revenue by brand across years, region-filtered
    // supplier dim (dims filtered THEN broadcast)
    "ssb_q2_1" -> ((spark, dir) =>
      fact(spark, dir)
        .join(broadcast(partDim(spark, dir).filter(col("p_category") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "ASIA")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("d_year"), col("p_brand"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("d_year"), col("p_brand"))),
    "ssb_q2_2" -> ((spark, dir) =>
      fact(spark, dir)
        .join(broadcast(partDim(spark, dir).filter(col("p_brand").isin("Brand#22", "Brand#23"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "AMERICA")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("d_year"), col("p_brand"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("d_year"), col("p_brand"))),
    "ssb_q2_3" -> ((spark, dir) =>
      fact(spark, dir)
        .join(broadcast(partDim(spark, dir).filter(col("p_brand") === "Brand#14")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "EUROPE")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("d_year"), col("p_brand"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("d_year"), col("p_brand"))),
    // ---- flight 3: revenue by customer/supplier nation over time
    "ssb_q3_1" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("d_year").between(1996, 1998))
        .join(broadcast(custDim(spark, dir).filter(col("c_region") === "ASIA")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "ASIA")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nation"), col("s_nation"), col("d_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("c_nation"), col("s_nation"), col("d_year"))),
    "ssb_q3_2" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("d_year").between(1996, 1998))
        .join(broadcast(custDim(spark, dir).filter(col("c_region") === "AMERICA")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "AMERICA")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nation"), col("s_nation"), col("d_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("c_nation"), col("s_nation"), col("d_year"))),
    "ssb_q3_3" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("d_year").between(1996, 1998))
        .join(broadcast(custDim(spark, dir)
            .filter(col("c_nation").isin("NATION_5", "NATION_10"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppDim(spark, dir)
            .filter(col("s_nation").isin("NATION_5", "NATION_10"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nation"), col("s_nation"), col("d_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("c_nation"), col("s_nation"), col("d_year"))),
    "ssb_q3_4" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1998-01-01"))
        .join(broadcast(custDim(spark, dir)
            .filter(col("c_nation").isin("NATION_5", "NATION_10"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppDim(spark, dir)
            .filter(col("s_nation").isin("NATION_5", "NATION_10"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nation"), col("s_nation"), date_trunc("month", col("o_orderdate")).as("d_month"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("c_nation"), col("s_nation"), col("d_month"))),
    // ---- flight 4: profit (revenue − supplycost proxy)
    "ssb_q4_1" -> ((spark, dir) =>
      fact(spark, dir)
        .join(broadcast(custDim(spark, dir).filter(col("c_region") === "AMERICA")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "AMERICA")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(partDim(spark, dir)
            .filter(col("p_category").isin("ECONOMY", "STANDARD"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("d_year"), col("c_nation"))
        .agg(dsum(profit).as("profit"))
        .orderBy(col("d_year"), col("c_nation"))),
    "ssb_q4_2" -> ((spark, dir) =>
      fact(spark, dir)
        .filter(col("d_year").between(1997, 1998))
        .join(broadcast(custDim(spark, dir).filter(col("c_region") === "AMERICA")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "AMERICA")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(partDim(spark, dir)
            .filter(col("p_category").isin("ECONOMY", "STANDARD"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("d_year"), col("s_nation"), col("p_category"))
        .agg(dsum(profit).as("profit"))
        .orderBy(col("d_year"), col("s_nation"), col("p_category"))),
    "ssb_q4_3" -> ((spark, dir) =>
      fact(spark, dir)
        .join(broadcast(suppDim(spark, dir).filter(col("s_region") === "AMERICA")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(partDim(spark, dir).filter(col("p_category") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("d_year"), col("s_nation"), col("p_brand"))
        .agg(dsum(profit).as("profit"))
        .orderBy(col("d_year"), col("s_nation"), col("p_brand"))))

  private val duckRev = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"
  private val duckProfit =
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)"
  private val suppDimSql =
    "supplier JOIN nation sn ON s_nationkey = sn.n_nationkey JOIN region sr ON sn.n_regionkey = sr.r_regionkey"
  private val custDimSql =
    "customer JOIN nation cn ON c_nationkey = cn.n_nationkey JOIN region cr ON cn.n_regionkey = cr.r_regionkey"

  def oracles: Map[String, String] = Map(
    "ssb_q1_1" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(year(o_orderdate) AS INT) = 1996
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 25""".stripMargin,
    "ssb_q1_2" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
        |  AND l_discount BETWEEN 0.06 AND 0.08 AND l_quantity BETWEEN 26 AND 35""".stripMargin,
    "ssb_q1_3" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1996-02-08'
        |  AND l_discount BETWEEN 0.08 AND 0.10 AND l_quantity BETWEEN 36 AND 40""".stripMargin,
    "ssb_q2_1" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS d_year, p_brand, $duckRev AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |WHERE split_part(p_type, ' ', 1) = 'ECONOMY' AND sr.r_name = 'ASIA'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q2_2" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS d_year, p_brand, $duckRev AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |WHERE p_brand IN ('Brand#22', 'Brand#23') AND sr.r_name = 'AMERICA'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q2_3" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS d_year, p_brand, $duckRev AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |WHERE p_brand = 'Brand#14' AND sr.r_name = 'EUROPE'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q3_1" ->
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
        |  CAST(year(o_orderdate) AS INT) AS d_year, $duckRev AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN $custDimSql ON o_custkey = c_custkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |WHERE cr.r_name = 'ASIA' AND sr.r_name = 'ASIA'
        |  AND CAST(year(o_orderdate) AS INT) BETWEEN 1996 AND 1998
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "ssb_q3_2" ->
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
        |  CAST(year(o_orderdate) AS INT) AS d_year, $duckRev AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN $custDimSql ON o_custkey = c_custkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
        |  AND CAST(year(o_orderdate) AS INT) BETWEEN 1996 AND 1998
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "ssb_q3_3" ->
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
        |  CAST(year(o_orderdate) AS INT) AS d_year, $duckRev AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN $custDimSql ON o_custkey = c_custkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |WHERE cn.n_name IN ('NATION_5', 'NATION_10')
        |  AND sn.n_name IN ('NATION_5', 'NATION_10')
        |  AND CAST(year(o_orderdate) AS INT) BETWEEN 1996 AND 1998
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "ssb_q3_4" ->
      s"""SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
        |  date_trunc('month', o_orderdate) AS d_month, $duckRev AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN $custDimSql ON o_custkey = c_custkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |WHERE cn.n_name IN ('NATION_5', 'NATION_10')
        |  AND sn.n_name IN ('NATION_5', 'NATION_10')
        |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "ssb_q4_1" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS d_year, cn.n_name AS c_nation,
        |  $duckProfit AS profit
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN $custDimSql ON o_custkey = c_custkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
        |  AND split_part(p_type, ' ', 1) IN ('ECONOMY', 'STANDARD')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ssb_q4_2" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS d_year, sn.n_name AS s_nation,
        |  split_part(p_type, ' ', 1) AS p_category, $duckProfit AS profit
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN $custDimSql ON o_custkey = c_custkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
        |  AND CAST(year(o_orderdate) AS INT) BETWEEN 1997 AND 1998
        |  AND split_part(p_type, ' ', 1) IN ('ECONOMY', 'STANDARD')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "ssb_q4_3" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS d_year, sn.n_name AS s_nation,
        |  p_brand, $duckProfit AS profit
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN $suppDimSql ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE sr.r_name = 'AMERICA' AND split_part(p_type, ' ', 1) = 'ECONOMY'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)
}
