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

  /** Tolerant CSV load with the reference's max_filter_ratio contract
    * (`docs/.../loading/`, FE `LoadStmt` MAX_FILTER_RATIO): malformed
    * rows are dropped, but if they exceed `maxFilterRatio` of the
    * input the whole load FAILS — silent data loss above the declared
    * tolerance is an error, matching StarRocks load semantics.
    *
    * One pass: PERMISSIVE parse keeps the corrupt record in a marker
    * column; the ratio check aggregates the cached parse, then clean
    * rows flow on. Scale: the cache is the loaded batch itself (the
    * same data any load materializes); no second file read. */
  def readCsvTolerant(spark: SparkSession, dir: String, schema: StructType,
      maxFilterRatio: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    val parsed = spark.read.options(csvOptions)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt).csv(dir)
      .cache()
    val total = parsed.count()
    val bad = parsed.filter(col("_corrupt_record").isNotNull).count()
    if (total > 0 && bad.toDouble / total > maxFilterRatio) {
      parsed.unpersist()
      throw new IllegalStateException(
        s"load aborted: $bad/$total malformed rows exceeds max_filter_ratio=$maxFilterRatio")
    }
    parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
  }

  /** Recursive delete (idempotent) — gate queries use it to start
    * from a clean table directory so reruns are deterministic. */
  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
