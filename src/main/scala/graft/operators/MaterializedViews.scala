package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Materialized views: precomputed results with full or incremental
  * refresh.
  *
  * Reference: SYNC/ASYNC/INCREMENTAL MVs
  * (`fe/fe-core/src/main/java/com/starrocks/catalog/MaterializedView.java:140,199-212`,
  * stream plan nodes `gensrc/thrift/PlanNodes.thrift:83-85`). The
  * Spark-native shape (SURVEY.md §1.1): an MV is a parquet table plus
  * the definition that produced it —
  *  - SYNC/full refresh ≡ recompute + atomic directory overwrite;
  *  - INCREMENTAL refresh ≡ the same definition applied to a
  *    Structured Streaming source with a checkpoint, so each refresh
  *    processes only new files (Trigger.AvailableNow micro-batch).
  *
  * Scale notes: full refresh is a plain batch job (AQE-planned);
  * incremental refresh state is bounded by the aggregation keys ×
  * watermark window, not input size — the property that makes an MV
  * on a 100 TB fact table refreshable in O(new data).
  */
object MaterializedViews {

  /** Definition: name + the view as a function of the session. The
    * definition runs identically over a batch or streaming source —
    * keep transforms to Column expressions for that to hold. */
  final case class MvDef(name: String, define: DataFrame => DataFrame)

  private def path(baseDir: String, name: String) = s"$baseDir/$name"

  /** Full (SYNC-style) refresh: recompute and atomically replace.
    * If the MV is registered for auto-rewrite, refresh THROUGH
    * [[graft.plans.MvRewrite.register]]: it deregisters first (so the
    * refresh write is not itself rewritten to read the path it
    * overwrites) and re-registers with a fresh scan of the new files —
    * otherwise rewrites would silently serve stale data. */
  def refreshFull(source: DataFrame, mv: MvDef, baseDir: String): Unit = {
    val out = mv.define(source)
    if (graft.plans.MvRewrite.registered.contains(mv.name))
      graft.plans.MvRewrite.register(out.sparkSession, mv.name, out, path(baseDir, mv.name))
    else
      out.write.mode("overwrite").parquet(path(baseDir, mv.name))
  }

  /** Incremental (ASYNC-style) refresh: apply the same definition to a
    * streaming source; only new files since the checkpoint are read.
    * Caller's `streamSource` must be a readStream DataFrame. */
  def refreshIncremental(streamSource: DataFrame, mv: MvDef, baseDir: String,
      checkpointDir: String): StreamingQuery =
    mv.define(streamSource).writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", path(baseDir, mv.name))
      .option("checkpointLocation", s"$checkpointDir/${mv.name}")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Read the materialized result (the MV "scan" the optimizer would
    * rewrite a matching query to). */
  def read(spark: SparkSession, baseDir: String, name: String): DataFrame =
    spark.read.parquet(path(baseDir, name))
}
