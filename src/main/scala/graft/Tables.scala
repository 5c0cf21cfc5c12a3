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

  // Per-(session, dir) metadata caches. `spark.read.parquet` pays a
  // driver-side file listing + footer/schema read on EVERY call; at
  // ~10 tables x ~500 gate invocations per bench flight that is pure
  // repeated metadata work (the reference keeps table metadata in its
  // FE catalog and resolves names from memory). Caching the LOGICAL
  // DataFrame reuses the resolved relation (file index + schema); no
  // data or results are cached — every action still scans parquet.
  private val loadCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
  private val registeredDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = loadCache.synchronized {
      var m = loadCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        loadCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(s"$dir/$name", _ => loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
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

  /** Register every table as a temp view named after the table.
    * Idempotent per (session, dir): repeat calls with the same dir are
    * free (no gate shadows these names — verified by grep; a dir
    * switch re-registers). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    registeredDir.synchronized {
      if (registeredDir.get(spark) != dir) {
        names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
        registeredDir.put(spark, dir)
      }
    }
}
