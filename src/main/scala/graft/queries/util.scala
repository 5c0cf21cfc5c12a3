package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Shared helpers for query areas. */
object util {
  /** Order-independent exact double sum: route through DECIMAL so
    * Spark's partial-agg ordering and DuckDB agree bit-for-bit. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  def ts(s: String): Column = lit(s).cast("timestamp")

  /** Register all tables as views and run Spark SQL. */
  def sqlq(spark: SparkSession, dir: String)(text: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(text)
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)
}
