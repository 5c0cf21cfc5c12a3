package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Delta-protocol WRITE-path interop (reference: ICEBERG/HIVE table
  * sinks, `gensrc/thrift/DataSinks.thrift:45-65` — the engine's tables
  * must be consumable by the open ecosystem, not only by its own
  * reader): materialize a minimal, protocol-conformant `_delta_log`
  * beside a native Lake table so any Delta reader (including this
  * repo's [[DeltaRead]]) reads the same data — with time travel, since
  * each Lake snapshot exports as one Delta commit.
  *
  * Mapping: Lake snapshot v (1-based) → Delta version v-1. A commit's
  * actions are the FILE DIFF between consecutive snapshots (add for
  * new files, remove for files dropped by CoW delete/update/compact),
  * so the log replays to exactly the snapshot's live set. Commit 0
  * carries protocol (minReader 1 / minWriter 2) + metaData with the
  * table schema and partition columns; adds carry per-file stats
  * (numRecords from the manifest — no file reopens). Paths are
  * RELATIVE to the table root and percent-encoded per the protocol.
  *
  * The export is idempotent and incremental: already-exported versions
  * are skipped (exclusive create), so calling after each Lake commit
  * streams the log forward — an O(changed files) metadata write, no
  * data copies at any scale.
  */
object DeltaExport {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Percent-encode a relative path per the Delta spec (real writers
    * encode anything a URI requires; '/' separators stay). Shared
    * with DeltaRead.writeCheckpoint so checkpoints store paths in the
    * same encoded form as the JSON log. */
  private[sources] def encodePath(rel: String): String =
    new java.net.URI(null, null, rel, null).toASCIIString

  /** Export all not-yet-exported Lake snapshots as Delta commits.
    * Returns the latest Delta version written (or -1 for none). */
  def exportDeltaLog(spark: SparkSession, table: String): Long = {
    val cur = Lake.currentVersion(spark, table)
    require(cur > 0, s"no committed Lake version at $table")
    val f = fs(spark, table)
    val qualified = f.makeQualified(new Path(table)).toString
    val mapper = graft.functions.JsonKernel.mapper
    def rel(p: String): String = {
      val r = p.stripPrefix(s"$qualified/").stripPrefix(s"$table/")
      require(!r.contains(":"), s"cannot relativize $p against $qualified")
      r
    }
    // Snapshots carrying merge-on-read delete vectors are NOT
    // expressible as whole-file add/remove actions (Delta's own
    // deletion-vector encoding — RoaringBitmap sidecars — is out of
    // scope): a naive export would serve deleted rows as live. Export
    // the DV-free snapshots only, diffing clean-to-clean (for a table
    // that never used MoR this is the identical v → v-1 mapping); the
    // CURRENT snapshot must be clean or the exported table would lag
    // the Lake state — fold first.
    // one manifest read per version per CALL (memoized): the clean
    // filter + per-version diffs would otherwise re-read each JSON
    // up to three times, and export-after-every-commit workflows call
    // this often
    val snapCache = scala.collection.mutable.Map[Int, Lake.Snapshot]()
    def snapOf(v: Int) = snapCache.getOrElseUpdate(v,
      Lake.readSnapshot(spark, table, v))
    require(snapOf(cur).dvFiles.isEmpty,
      s"current Lake snapshot v$cur carries pending delete vectors — " +
        s"run Lake.foldDeletes before Delta export (or export via " +
        s"IcebergExport, which emits format v2 position deletes)")
    val cleanVs = (1 to cur).filter(v => snapOf(v).dvFiles.isEmpty)
    var last = -1L
    cleanVs.zipWithIndex.foreach { case (v, dv) =>
      val logPath = new Path(f"$table/_delta_log/$dv%020d.json")
      if (!f.exists(logPath)) {
        val snap = snapOf(v)
        val prev: Map[String, Lake.LakeFile] =
          if (dv == 0) Map.empty
          else snapOf(cleanVs(dv - 1)).files
            .map(x => rel(x.path) -> x).toMap
        val nowFiles = snap.files.map(x => rel(x.path) -> x).toMap
        val sb = new StringBuilder
        if (dv == 0) {
          sb.append("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""").append('\n')
          val schemaStr = mapper.writeValueAsString(snap.schemaJson)
          val partCols = mapper.writeValueAsString(snap.partitionCols.toArray)
          sb.append(s"""{"metaData":{"id":"graft-${Integer.toHexString(table.hashCode)}","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":$partCols,"configuration":{},"createdTime":${snap.createdAtMs}}}""").append('\n')
        }
        (prev.keySet -- nowFiles.keySet).toSeq.sorted.foreach { r =>
          val p = mapper.writeValueAsString(encodePath(r))
          sb.append(s"""{"remove":{"path":$p,"deletionTimestamp":${snap.createdAtMs},"dataChange":true}}""").append('\n')
        }
        (nowFiles.keySet -- prev.keySet).toSeq.sorted.foreach { r =>
          val lf = nowFiles(r)
          val p = mapper.writeValueAsString(encodePath(r))
          val pvals = {
            import scala.jdk.CollectionConverters._
            mapper.writeValueAsString(lf.partitionValues.asJava)
          }
          val stats = mapper.writeValueAsString(s"""{"numRecords":${lf.rowCount}}""")
          sb.append(s"""{"add":{"path":$p,"partitionValues":$pvals,"size":${lf.sizeBytes},"modificationTime":${lf.modifiedMs},"dataChange":true,"stats":$stats}}""").append('\n')
        }
        f.mkdirs(logPath.getParent)
        try AtomicPublish.publish(spark, logPath, sb.toString.getBytes("UTF-8"))
        catch { case _: java.util.ConcurrentModificationException =>
          // another exporter already published this version — idempotent
        }
      }
      last = dv.toLong
    }
    // protocol checkpoints every 10 Delta versions: once written, the
    // JSON commits they cover can be cleaned and readers still enter
    // at the checkpoint (DeltaRead.writeCheckpoint)
    val have = DeltaRead.checkpointVersions(spark, table).toSet
    (10L to last by 10L).filterNot(have).foreach(v =>
      DeltaRead.writeCheckpoint(spark, table, Some(v)))
    last
  }
}
