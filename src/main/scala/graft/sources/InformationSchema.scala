package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** information_schema virtual tables over the engine's catalog.
  *
  * Reference: SchemaScanNode (`be/src/exec/schema_scan_node.cpp`,
  * `be/src/schema_scanner/`) — metadata exposed as queryable rows.
  * Spark-native: build small DataFrames from parquet footers; metadata
  * is driver-side by nature (it IS the catalog), so createDataFrame is
  * the right tool here, not a distributed scan.
  */
object InformationSchema {

  /** SQL-ish lowercase type names (duckdb/information_schema style). */
  private def typeName(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "integer"
    case ShortType => "smallint"
    case ByteType => "tinyint"
    case DoubleType => "double"
    case FloatType => "float"
    case StringType => "varchar"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case BinaryType => "blob"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _) => s"${typeName(e)}[]"
    case m: MapType => s"map(${typeName(m.keyType)}, ${typeName(m.valueType)})"
    case s: StructType => "struct"
    case other => other.simpleString
  }

  /** `information_schema.columns` for the given tables in a data dir. */
  def columns(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    tables.flatMap { t =>
      spark.read.parquet(s"$dir/$t.parquet").schema.fields.map { f =>
        (t, f.name, typeName(f.dataType))
      }
    }.toDF("table_name", "column_name", "data_type")
  }

  /** `information_schema.tables`: name + column count. */
  def tables(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    tables.map { t =>
      (t, spark.read.parquet(s"$dir/$t.parquet").schema.size.toLong)
    }.toDF("table_name", "n_columns")
  }

  /** `information_schema.statistics`: per-numeric-column ANALYZE stats
    * (n / nulls / NDV / min / max / mean) — the catalog view over
    * `operators/Profile`, one scan per table (ref FE statistic collect
    * jobs feeding the CBO). */
  def statistics(spark: SparkSession, dir: String,
      tableNames: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.NumericType
    tableNames.map { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val numCols = df.schema.fields
        .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
      graft.operators.Profile.numericProfile(df, numCols)
        .select(lit(t).as("table_name"), col("col_name"), col("n"),
          col("n_null"), col("ndv"), col("min_v"), col("max_v"), col("mean"))
    }.reduce(_ unionByName _)
  }
}
