package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Colocated (bucketed) tables — shuffle-free keyed joins.
  *
  * Reference: bucket-shuffle / colocate join
  * (`gensrc/thrift/Partitions.thrift:57` TABLET_BUCKET_SHUFFLE,
  * FE colocate group logic): tables hash-distributed on the same key
  * into the same bucket count join tablet-to-tablet with no exchange.
  *
  * Spark mapping: `bucketBy(n, key)` tables. A join of two tables
  * bucketed on the join key with the same bucket count satisfies both
  * sides' required distribution — the plan has NO Exchange on either
  * side (asserted in PlanSpec). On a 100 TB fact⋈fact join this
  * removes the dominant shuffle entirely at the cost of bucketing at
  * write time — exactly the reference's colocation-group trade.
  */
object Colocate {

  /** Persist as an external bucketed table (sorted within buckets so
    * sort-merge joins skip the per-partition sort too). */
  def saveBucketed(df: DataFrame, name: String, path: String,
      bucketCols: Seq[String], buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)
}
