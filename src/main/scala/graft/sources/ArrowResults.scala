package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.apache.spark.sql.types.StructType

/** Arrow result surface — query results leave the engine as Arrow
  * record batches rather than a row protocol (reference:
  * `be/src/exec/arrow_flight_batch_reader.cpp`,
  * `fe/fe-core/.../arrowflight/` — the reference serves results over
  * Arrow Flight so BI/dataframe clients skip row decode entirely).
  *
  * Scale shape: batch serialization happens on the EXECUTORS
  * ([[resultBatches]] is an RDD of opaque byte blobs, one-or-more
  * batches per partition, each bounded by
  * spark.sql.execution.arrow.maxRecordsPerBatch). A Flight endpoint
  * would map one DoGet ticket per partition and stream blobs straight
  * from executor to client — the driver never holds the result set.
  * [[ipcStream]] (driver-side assembly into one self-describing
  * stream) is for single-consumer results and tests; it is the only
  * collect in this file and is bounded by the declared result size.
  */
object ArrowResults {

  /** Result set as executor-resident Arrow record-batch bytes. */
  def resultBatches(df: DataFrame): RDD[Array[Byte]] =
    ArrowBridge.toBatchRdd(df)

  /** One self-describing Arrow IPC stream (schema + batches + EOS) —
    * readable by any Arrow client (pyarrow.ipc.open_stream, arrow-js,
    * arrow-vector's ArrowStreamReader...).
    */
  def ipcStream(df: DataFrame): Array[Byte] = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val out = new ByteArrayOutputStream()
    ArrowBridge.writeIpcStream(
      df.schema, tz, resultBatches(df).collect().iterator, out)
    out.toByteArray
  }

  /** Inverse of [[resultBatches]]: rebuild a DataFrame from batch
    * bytes + schema, e.g. to re-ingest a cached Arrow result.
    */
  def fromBatches(
      spark: SparkSession,
      schema: StructType,
      batches: Iterator[Array[Byte]]): DataFrame =
    ArrowBridge.fromBatches(spark, schema.json, batches)
}
