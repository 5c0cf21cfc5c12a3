package graft

import org.apache.spark.sql.SparkSession

/** Session facade for the graft engine.
  *
  * Plays the role of the reference FE's session/coordinator setup
  * (StarRocks `qe/ConnectProcessor` + `qe/SessionVariable`): one place
  * that pins execution-relevant settings. Everything else (optimizer,
  * shuffle, spill) is Catalyst/AQE — see SURVEY.md §4.
  *
  * Scale notes (100 TB target):
  *  - AQE on: runtime partition coalescing, skew-join splitting and
  *    dynamic join-strategy switch replace the reference's CBO
  *    re-planning + skew rules (`SkewJoinOptimizeRule.java`).
  *  - runtime bloom filters ≈ the reference's global runtime filters
  *    (`be/src/exec_primitive/runtime_filter/`).
  *  - ANSI off: the reference is MySQL-flavored (lenient casts,
  *    NULL on bad input, `be/src/exprs/cast_expr.cpp`); Spark ANSI
  *    mode would raise instead.
  */
object Engine {

  /** Apply graft's standard configuration to a builder. */
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata parquet carries naive timestamp[us] (no UTC
      // adjustment flag); read it as session-TZ TIMESTAMP (UTC
      // session above) rather than TIMESTAMP_NTZ so event-time
      // streaming (watermarks require LTZ) and epoch arithmetic keep
      // working and values match the DuckDB oracle's naive reading
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  /** Build (or reuse) a configured session and register graft functions. */
  def session(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")): SparkSession = {
    val spark = configure(SparkSession.builder().appName("graft"), cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Session.prepare(spark)
  }
}
