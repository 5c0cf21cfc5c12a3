package org.apache.spark.sql.graftbridge

import java.io.OutputStream

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}
import org.apache.spark.sql.types.StructType

/** Bridge into Spark's `private[sql]` Arrow result machinery.
  *
  * The engine's Arrow result surface (reference:
  * `be/src/exec/arrow_flight_batch_reader.cpp` — results leave the
  * backend as Arrow record batches, not row protocols) rides on the
  * exact converters Spark itself uses for its Python/R collect paths,
  * so the byte format is wire-compatible with every Arrow IPC client.
  * Lives under org.apache.spark.sql for access.
  */
object ArrowBridge {

  /** Each partition of the result, serialized on the executors to
    * Arrow IPC record-batch bytes (no schema header; batch size
    * bounded by spark.sql.execution.arrow.maxRecordsPerBatch). The
    * driver never materializes rows — only relays opaque byte blobs,
    * which is what lets a Flight-style endpoint stream 100 TB results
    * partition-by-partition.
    */
  def toBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].toArrowBatchRdd

  /** Rebuild a DataFrame from record-batch bytes + the schema's JSON
    * (as produced by `StructType.json`). Inverse of [[toBatchRdd]].
    */
  def fromBatches(
      spark: SparkSession,
      schemaJson: String,
      batches: Iterator[Array[Byte]]): DataFrame =
    ArrowConverters.toDataFrame(
      batches, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** Frame schema + batches as one self-describing Arrow IPC stream
    * (what a Flight DoGet ticket would return): schema message first,
    * then each batch, then EOS.
    */
  def writeIpcStream(
      schema: StructType,
      timeZoneId: String,
      batches: Iterator[Array[Byte]],
      out: OutputStream): Unit = {
    val w = new ArrowBatchStreamWriter(schema, out, timeZoneId,
      true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */)
    w.writeBatches(batches)
    w.end()
  }
}
