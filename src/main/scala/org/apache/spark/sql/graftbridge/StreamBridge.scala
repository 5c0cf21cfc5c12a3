package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge into `private[sql] SparkSession.internalCreateDataFrame`.
  *
  * A v1 streaming `Source.getBatch` must return a DataFrame whose plan
  * reports `isStreaming = true` (MicroBatchExecution asserts it); the
  * built-in file source gets this via `LogicalRelation(..,
  * isStreaming = true)`, but a batch computed by arbitrary DataFrame
  * logic (joins, windows — e.g. a lake change feed derived from
  * manifests) has only batch leaves. The standard escape hatch —
  * what the original v1 Kafka source did — is to hand the planned
  * `queryExecution.toRdd` (still lazy, still distributed) back through
  * `internalCreateDataFrame(rdd, schema, isStreaming = true)`. */
object StreamBridge {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
