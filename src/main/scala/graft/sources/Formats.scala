package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format ingestion: CSV / JSON / ORC / Parquet read-write.
  *
  * Reference: FileScanNode + format readers (`be/src/exec/
  * file_scan_node.cpp`, `be/src/formats/{csv,json,orc,parquet}/`) —
  * the Broker/Stream Load parsing surface. Spark's DataSource framework
  * IS this layer; these helpers pin the option sets the engine
  * considers canonical (header CSV, ISO timestamps, permissive JSON)
  * so load behavior is consistent across call sites.
  */
object Formats {

  // microsecond timestamps: the default SSS (millisecond) format would
  // silently truncate µs-precision event times on the way out
  private val tsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  val csvOptions: Map[String, String] = Map(
    "header" -> "true",
    "timestampFormat" -> tsFormat,
    "escape" -> "\"",
    "mode" -> "PERMISSIVE")

  val jsonOptions: Map[String, String] = Map("timestampFormat" -> tsFormat)

  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").options(csvOptions).csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.options(csvOptions).schema(schema).csv(dir)

  def writeJson(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").options(jsonOptions).json(dir)

  def readJson(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.options(jsonOptions).schema(schema).json(dir)

  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)
}
