package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.sources.Lake

/** STRUCTURED STREAMING source over a native-Lake table's row-level
  * change feed — `spark.readStream.format("graft-lake-cdc")
  * .option("table", path).load()` yields the table's columns plus
  * `__change_type` (insert/delete) and `__commit_version`, in the
  * [[graft.sources.Lake.changes]] retraction contract.
  *
  * This is the engine-native equivalent of the reference's
  * incremental-MV/routine-load ingestion: offsets are LAKE VERSIONS, a
  * micro-batch covers `(startOffset, endOffset]` commits, and the
  * checkpoint's offset log makes the subscription exactly-once across
  * restarts with NO side ledger — unlike [[ChangeFeed.poll]], which
  * exists for poll-style consumers, the streaming runtime itself
  * replays/advances versions.
  *
  * Options: `table`/`path` (the lake table), `startingVersion`
  * (default 0 = emit the v1 snapshot as inserts, then tail; set to the
  * current version to tail only).
  *
  * Scale shape: each micro-batch plans `Lake.changes` for its version
  * window — manifest-driven, O(touched files) per commit, never
  * table-sized; the batch DataFrame is handed to the runtime as its
  * (lazy, distributed) planned RDD via [[StreamBridge]], the v1-source
  * contract for derived batch plans. */
class LakeCdcSource(spark: SparkSession, table: String,
    startingVersion: Long) extends Source {

  override val schema: StructType = LakeCdcSource.cdcSchema(spark, table)

  private def ver(o: OffsetV1): Long = o.json.trim.toLong

  override def getOffset: Option[OffsetV1] = {
    val v = Lake.currentVersion(spark, table).toLong
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    val df = LakeCdcSource.changesFrom(spark, table, from, to, schema)
    StreamBridge.streamingDataFrame(spark, df.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}

object LakeCdcSource {
  /** The feed's schema: the table's CURRENT logical columns + the
    * retraction-contract markers. */
  def cdcSchema(spark: SparkSession, table: String): StructType =
    StructType(Lake.read(spark, table).schema.fields.toSeq :+
      StructField("__change_type", StringType, nullable = false) :+
      StructField("__commit_version", IntegerType, nullable = false))

  /** Changes in `(from, to]`; `from = 0` prepends the v1 snapshot as
    * inserts (Lake.changes walks from v1 forward, so the initial
    * image needs one snapshot read). Column order pinned to `schema`. */
  private[streaming] def changesFrom(spark: SparkSession, table: String,
      from: Long, to: Long, schema: StructType): DataFrame = {
    val cols = schema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq
    val initial =
      if (from > 0) None
      else Some(Lake.read(spark, table, versionAsOf = Some(1))
        .withColumn("__change_type", lit("insert"))
        .withColumn("__commit_version", lit(1)))
    val tail =
      if (to <= math.max(from, 1L)) None
      else Some(Lake.changes(spark, table, math.max(from, 1L).toInt, to.toInt))
    (initial.toSeq ++ tail.toSeq)
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map(_.select(cols: _*))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
  }
}

/** `format("graft-lake-cdc")` registration (META-INF services) —
  * also reachable by full class name. */
class LakeCdcSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake-cdc"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.get("table").orElse(parameters.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-lake-cdc needs .option(\"table\", <lake table path>)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schema.getOrElse(
      LakeCdcSource.cdcSchema(ctx.sparkSession, tableOf(parameters))))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LakeCdcSource(ctx.sparkSession, tableOf(parameters),
      parameters.getOrElse("startingVersion", "0").toLong)
}
