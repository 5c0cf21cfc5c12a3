package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the graft engine.
  *
  * The reference's catalog (`fe/fe-core/.../catalog/OlapTable.java`)
  * resolves a table name to partitioned/bucketed tablet storage; here a
  * table name resolves to a parquet directory/file under a scale-factor
  * dir. Parquet row groups play the reference's segment role
  * (zone maps ≈ min/max stats, dictionary pages ≈ global dict) — see
  * SURVEY.md §2.1.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables worth broadcasting in joins at any scale. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part", "customer")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); Spark reads it as Long
    // (spark.sql.legacy.parquet.nanosAsLong) — normalize to µs
    // TimestampType (values are µs-aligned, so this is lossless).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        // integral `div`, NOT `/`: double division of an ~1.7e18 ns
        // value loses up to 256 ns (ulp) before truncation
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
