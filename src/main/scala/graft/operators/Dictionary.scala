package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global dictionary for LOW-CARDINALITY string columns — the
  * Spark-native shape of the reference's global-dict machinery
  * (FE low-cardinality dict optimization / `dict_mapping`,
  * `bitmap_dict`; the BE rewrites string group-bys and predicates to
  * int codes when a column's NDV is under its threshold).
  *
  * The dictionary is DETERMINISTIC: code = dense rank of the value in
  * sorted order, so two builds over the same value set agree — the
  * property that lets codes be persisted, shared across tables, and
  * reproduced by an oracle.
  *
  * Scale: `build` is a distinct + sort over the value set, which is
  * small BY CONTRACT (that is what low-cardinality means — the
  * reference likewise only builds dicts under an NDV cap); encode and
  * decode are broadcast hash joins against the kilobyte-sized dict,
  * adding no shuffle to the fact side. Aggregations and joins over
  * the encoded int column then shuffle 4-byte codes instead of
  * strings — the same win the reference's rewrite buys.
  */
object Dictionary {

  /** (value, code) pairs; codes are 1-based dense ranks in sorted
    * value order. NULL is not encoded (stays NULL through encode). */
  def build(df: DataFrame, valueCol: String): DataFrame = {
    val distinct = df.select(col(valueCol).as("value"))
      .filter(col("value").isNotNull).distinct()
    // the window runs over the (small, by contract) distinct set only
    distinct.withColumn("code",
      row_number().over(Window.orderBy(col("value"))).cast("int"))
  }

  /** Replace valueCol with its int code (column name preserved). */
  def encode(df: DataFrame, valueCol: String, dict: DataFrame): DataFrame = {
    val d = dict.withColumnRenamed("value", valueCol)
    df.join(broadcast(d), Seq(valueCol), "left")
      .drop(valueCol)
      .withColumnRenamed("code", valueCol)
  }

  /** Inverse of encode: int codes back to strings. */
  def decode(df: DataFrame, codeCol: String, dict: DataFrame): DataFrame = {
    val d = dict.withColumnRenamed("code", codeCol)
    df.join(broadcast(d), Seq(codeCol), "left")
      .drop(codeCol)
      .withColumnRenamed("value", codeCol)
  }
}
