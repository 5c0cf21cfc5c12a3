package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage-pinning policy for LOOP-critical intermediates (pageRank,
  * connectedComponents, kCore, BFS, dictionary upsert): the values an
  * iterative operator carries round to round.
  *
  * Default (`spark.graft.pins.replicated` unset/false):
  * `localCheckpoint(eager)` — the cheapest lineage cut. Blocks live
  * unreplicated in executor memory/disk and are NOT recomputable on
  * executor loss; on a single machine (local[n]) executor loss is
  * process death, so the trade is free.
  *
  * At cluster scale (`spark.graft.pins.replicated=true`): persist with
  * 2x replication (MEMORY_AND_DISK_2) and keep lineage. One lost node
  * then costs a partition re-fetch from the replica — or, worst case,
  * a lineage recompute — instead of failing the whole multi-hour job
  * (guide §5's localCheckpoint caveat). The CacheManager substitutes
  * the cached relation into subsequent iterations' plans, so the
  * physical plan stays flat either way; the eager materialization
  * keeps both modes' job structure identical. Loop iterations are
  * bounded (5–50), so per-iteration pins accumulate bounded blocks in
  * both modes (localCheckpoint persists each RDD too).
  *
  * Per-gate BOUNDED intermediates (a histogram summary, a batch) stay
  * on plain localCheckpoint at their call sites: losing one fails a
  * single short gate, not an iterative job's accumulated progress.
  */
object Pins {
  def loopPin(df: DataFrame): DataFrame = {
    val replicated = df.sparkSession.conf
      .getOption("spark.graft.pins.replicated").exists(_.toBoolean)
    if (replicated) {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
      p.count() // materialize now — same eager contract as localCheckpoint(true)
      p
    } else df.localCheckpoint(true)
  }
}
