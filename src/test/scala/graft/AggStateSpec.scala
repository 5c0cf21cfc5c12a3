package graft

import org.apache.spark.sql.functions._

/** Generic agg-state combinators: any registered aggregate must lift
  * into a storable partial state whose union/merge equals the direct
  * computation — across all three Catalyst aggregate flavors. */
class AggStateSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    Session.prepare(spark)
    val d = (1 to 2000).map(i => (i % 7, (i * 37 % 500).toDouble, (i % 157).toLong))
      .toDF("g", "x", "u")
    d.createOrReplaceTempView("ast")
    d
  }

  test("declarative (avg): state -> union -> merge equals direct") {
    df
    val states = spark.sql(
      "SELECT g, agg_state('avg', x) AS s FROM ast GROUP BY g")
    states.createOrReplaceTempView("ast_avg")
    // fold day-states to a single state, then finalize
    val viaState = spark.sql(
      """SELECT agg_state_merge('avg',
        |  (SELECT agg_state_union('avg', s, CAST(NULL AS DOUBLE)) FROM ast_avg),
        |  CAST(NULL AS DOUBLE)) AS v""".stripMargin).head.getDouble(0)
    val direct = spark.sql("SELECT avg(x) FROM ast").head.getDouble(0)
    assert(math.abs(viaState - direct) < 1e-9, s"$viaState vs $direct")
  }

  test("imperative (approx_count_distinct HLL++): merge equals direct") {
    df
    val viaState = spark.sql(
      """SELECT agg_state_merge('approx_count_distinct', s, CAST(NULL AS BIGINT)) AS v
        |FROM (SELECT g, agg_state('approx_count_distinct', u) AS s
        |      FROM ast GROUP BY g)""".stripMargin).head.getLong(0)
    val direct = spark.sql("SELECT approx_count_distinct(u) FROM ast").head.getLong(0)
    assert(viaState === direct, "partial-state HLL++ must merge to the direct sketch result")
  }

  test("typed imperative (min_n): state table folds to the exact result") {
    df
    val viaState = spark.sql(
      """SELECT agg_state_merge('min_n', s, CAST(NULL AS DOUBLE), 3) AS v
        |FROM (SELECT g, agg_state('min_n', x, 3) AS s FROM ast GROUP BY g)""".stripMargin)
      .head.getSeq[Double](0)
    val direct = spark.sql("SELECT min_n(x, 3) FROM ast").head.getSeq[Double](0)
    assert(viaState === direct)
  }

  test("union keeps states mergeable across a second grouping level") {
    df
    // (g, u%2) states -> per-g union states -> global merge; decimal sum exact
    val viaState = spark.sql(
      """SELECT CAST(agg_state_merge('sum', s2, CAST(NULL AS DECIMAL(18,6))) AS DOUBLE) AS v
        |FROM (
        |  SELECT g, agg_state_union('sum', s, CAST(NULL AS DECIMAL(18,6))) AS s2
        |  FROM (SELECT g, u % 2 AS h, agg_state('sum', CAST(x AS DECIMAL(18,6))) AS s
        |        FROM ast GROUP BY g, u % 2)
        |  GROUP BY g)""".stripMargin)
      .collect().map(_.getDouble(0)).sum
    val direct = spark.sql(
      "SELECT CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) FROM ast").head.getDouble(0)
    assert(math.abs(viaState - direct) < 1e-6)
  }

  test("states survive a parquet round trip (AGG-keys table shape)") {
    df
    val dir = java.nio.file.Files.createTempDirectory("graft-aggstate").toString
    spark.sql(
      """SELECT g, agg_state('avg', x) AS avg_s, agg_state('min_n', x, 3) AS mn_s
        |FROM ast GROUP BY g""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("ast_pq")
    val r = spark.sql(
      """SELECT agg_state_merge('avg', avg_s, CAST(NULL AS DOUBLE)) AS a,
        |       agg_state_merge('min_n', mn_s, CAST(NULL AS DOUBLE), 3) AS m
        |FROM ast_pq""".stripMargin).head
    val direct = spark.sql("SELECT avg(x), min_n(x, 3) FROM ast").head
    assert(math.abs(r.getDouble(0) - direct.getDouble(0)) < 1e-9)
    assert(r.getSeq[Double](1) === direct.getSeq[Double](1))
  }

  test("string max and decimal avg buffers survive state serialization") {
    df
    val viaState = spark.sql(
      """SELECT agg_state_merge('max', s, CAST(NULL AS STRING)) AS mx,
        |  CAST(agg_state_merge('avg', s2, CAST(NULL AS DECIMAL(12,3))) AS DOUBLE) AS av
        |FROM (SELECT g, agg_state('max', concat('v', x)) AS s,
        |             agg_state('avg', CAST(x AS DECIMAL(12,3))) AS s2
        |      FROM ast GROUP BY g)""".stripMargin).head
    val direct = spark.sql(
      """SELECT max(concat('v', x)) AS mx,
        |  CAST(avg(CAST(x AS DECIMAL(12,3))) AS DOUBLE) AS av FROM ast""".stripMargin).head
    assert(viaState.getString(0) === direct.getString(0))
    assert(math.abs(viaState.getDouble(1) - direct.getDouble(1)) < 1e-9)
  }

  test("empty input folds to the aggregate's empty value") {
    df
    val r = spark.sql(
      """SELECT agg_state_merge('avg', s, CAST(NULL AS DOUBLE)) AS v
        |FROM (SELECT agg_state('avg', x) AS s FROM ast WHERE g < 0 GROUP BY g)""".stripMargin)
      .collect()
    // a GLOBAL aggregate over zero states still emits one row (SQL
    // semantics), evaluating the init buffer — avg of nothing is NULL,
    // same as direct avg over an empty relation
    assert(r.length === 1 && r.head.isNullAt(0))
    val r2 = spark.sql(
      """SELECT agg_state_merge('sum', s, CAST(NULL AS DOUBLE)) AS v
        |FROM (SELECT agg_state('sum', CAST(NULL AS DOUBLE)) AS s FROM ast GROUP BY g)""".stripMargin)
      .head
    assert(r2.isNullAt(0)) // states of all-null inputs merge to SQL NULL
  }

  test("non-aggregate name is rejected with a clear error") {
    df
    val e = intercept[Exception] {
      spark.sql("SELECT agg_state('abs', x) FROM ast GROUP BY g").collect()
    }
    assert(e.getMessage.contains("not an aggregate"))
  }
}
