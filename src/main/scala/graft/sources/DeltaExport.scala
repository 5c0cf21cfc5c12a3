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
  * carries protocol (minReader 1 / minWriter 2; upgraded to 3/7 +
  * the deletionVectors feature only by the first DV-carrying commit)
  * + metaData with the
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
    * Returns the latest Delta version written (or -1 for none).
    *
    * `withCdf` additionally materializes the CHANGE DATA FEED write
    * side (delta.io PROTOCOL.md §Change Data Files): any commit that
    * is not a pure append gets its row-level changes
    * ([[Lake.changes]] for the one-version window) written as
    * `_change_data/` parquet carrying the table's columns plus
    * `_change_type`, referenced by `cdc` actions in the commit — so
    * an external CDF reader consumes OUR deletes/upserts without
    * reconstructing them from add/remove + deletion vectors. Pure
    * appends emit no cdc action (the spec lets readers derive inserts
    * from their dataChange adds); maintenance rewrites (fold/compact)
    * emit an EMPTY cdc file — "files moved, no logical change" —
    * instead of the spurious remove+add churn a derivation would see.
    * Cost: O(changed rows) per commit, the same bound as the feed
    * itself. */
  def exportDeltaLog(spark: SparkSession, table: String,
      withCdf: Boolean = false): Long = {
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
    // one manifest read per version per CALL (memoized): the DV-state
    // computation + per-version diffs would otherwise re-read each
    // JSON several times, and export-after-every-commit workflows
    // call this often
    val snapCache = scala.collection.mutable.Map[Int, Lake.Snapshot]()
    def snapOf(v: Int) = snapCache.getOrElseUpdate(v,
      Lake.readSnapshot(spark, table, v))
    // merge-on-read delete vectors export as Delta DELETION VECTORS:
    // a data file whose cumulative masked-position set changed between
    // versions is removed and re-ADDED with a roaring-bitmap
    // descriptor (the protocol's DV-upgrade shape) — no fold needed.
    // Per version, the cumulative (relative data file → positions)
    // map; sidecar rows are batch-scale by the MoR contract, so the
    // driver-side collect is bounded.
    val dvSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__graft_dv_file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__graft_dv_pos",
        org.apache.spark.sql.types.LongType)))
    def normPath(s: String): String = java.net.URLDecoder.decode(
      new Path(s).toUri.getPath, "UTF-8")
    val dvCache = scala.collection.mutable.Map[Int, Map[String, Array[Long]]]()
    def dvStateOf(v: Int): Map[String, Array[Long]] = dvCache.getOrElseUpdate(v, {
      val snap = snapOf(v)
      if (snap.dvFiles.isEmpty) Map.empty
      else {
        val byNorm = snap.files.map(lf => normPath(lf.path) -> rel(lf.path)).toMap
        spark.read.schema(dvSchema).parquet(snap.dvFiles: _*)
          .collect()
          .groupBy(r => normPath(r.getString(0)))
          .flatMap { case (n, rows) =>
            byNorm.get(n).map(_ -> rows.map(_.getLong(1)).sorted) }
          .toMap
      }
    })
    // protocol staging: commit 0 declares the LEGACY {1,2} protocol
    // unless version 1 itself carries deletion vectors; the first
    // DV-carrying version upgrades in-commit to 3/7 + the
    // deletionVectors feature (the protocol allows a later protocol
    // action) — so DV-free exports stay readable by every
    // spec-compliant Delta reader, not only DV-capable ones
    lazy val firstDvVersion: Option[Int] =
      (1 to cur).find(v => dvStateOf(v).values.exists(_.nonEmpty))
    def dvProtocol = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""
    def metaDataAction(snap: Lake.Snapshot, withDvConf: Boolean): String = {
      val schemaStr = mapper.writeValueAsString(snap.schemaJson)
      val partCols = mapper.writeValueAsString(snap.partitionCols.toArray)
      val entries =
        (if (withDvConf) Seq(""""delta.enableDeletionVectors":"true"""") else Nil) ++
        (if (withCdf) Seq(""""delta.enableChangeDataFeed":"true"""") else Nil)
      val conf = entries.mkString("{", ",", "}")
      s"""{"metaData":{"id":"graft-${Integer.toHexString(table.hashCode)}","format":{"provider":"parquet","options":{}},"schemaString":$schemaStr,"partitionColumns":$partCols,"configuration":$conf,"createdTime":${snap.createdAtMs}}}"""
    }
    var last = -1L
    (1 to cur).foreach { v =>
      val dv = v - 1
      val logPath = new Path(f"$table/_delta_log/$dv%020d.json")
      if (!f.exists(logPath)) {
        val snap = snapOf(v)
        val prev: Map[String, Lake.LakeFile] =
          if (v == 1) Map.empty
          else snapOf(v - 1).files.map(x => rel(x.path) -> x).toMap
        val nowFiles = snap.files.map(x => rel(x.path) -> x).toMap
        val dvNow = dvStateOf(v)
        val dvPrev = if (v == 1) Map.empty[String, Array[Long]] else dvStateOf(v - 1)
        // carried files whose vector grew (or appeared) re-add upgraded
        val dvChanged = (nowFiles.keySet & prev.keySet).filter(r =>
          !java.util.Arrays.equals(
            dvNow.getOrElse(r, Array.emptyLongArray),
            dvPrev.getOrElse(r, Array.emptyLongArray)))
        val sb = new StringBuilder
        if (v == 1) {
          val dvHere = firstDvVersion.contains(1)
          sb.append(
            if (dvHere) dvProtocol
            else """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
            .append('\n')
          sb.append(metaDataAction(snap, withDvConf = dvHere)).append('\n')
        } else if (firstDvVersion.contains(v)) {
          // in-commit upgrade: protocol 3/7 + metaData re-emit with
          // the deletionVectors table feature enabled
          sb.append(dvProtocol).append('\n')
          sb.append(metaDataAction(snap, withDvConf = true)).append('\n')
        }
        // change-data files BEFORE the remove/add actions (order is
        // irrelevant to the protocol; grouping keeps the log legible)
        if (withCdf) {
          val removed = prev.keySet -- nowFiles.keySet
          val pureAppend = v > 1 && removed.isEmpty && dvChanged.isEmpty
          val isV1 = v == 1
          if (!pureAppend && !isV1) {
            val changed = Lake.changes(spark, table, v - 1, v)
              .withColumnRenamed("__change_type", "_change_type")
              .drop("__commit_version")
            val staging = s"$table/_cdc_stage_$v"
            val partCols = snap.partitionCols
            // change files must NOT store partition columns in-file —
            // a spec-compliant CDF reader derives them from each cdc
            // action's partitionValues (the add-action treatment)
            if (partCols.isEmpty) changed.coalesce(1)
              .write.mode("overwrite").parquet(staging)
            else changed.write.partitionBy(partCols: _*)
              .mode("overwrite").parquet(staging)
            // %XX-only decode: Spark's dir-name escaping leaves '+'
            // literal, URLDecoder would turn it into a space
            def unescape(s: String) = PathNames.unescapePathName(s)
            val found = scala.collection.mutable.ArrayBuffer[(Path, Long, Map[String, String])]()
            def walk(p: Path, vals: Map[String, String]): Unit =
              f.listStatus(p).foreach { st =>
                val name = st.getPath.getName
                if (st.isDirectory && name.contains("=")) {
                  val k = name.substring(0, name.indexOf('='))
                  walk(st.getPath,
                    vals + (k -> unescape(name.substring(name.indexOf('=') + 1))))
                } else if (name.endsWith(".parquet")) found += ((st.getPath, st.getLen, vals))
              }
            walk(new Path(staging), Map.empty)
            if (found.isEmpty) {
              // maintenance rewrite: partitionBy of an empty feed
              // writes no files, but the EMPTY cdc marker must exist —
              // without it readers re-derive spurious remove/add churn
              changed.limit(0).coalesce(1).write.mode("overwrite").parquet(staging)
              walk(new Path(staging), Map.empty)
            }
            f.mkdirs(new Path(s"$table/_change_data"))
            found.zipWithIndex.foreach { case ((part, len, vals), i) =>
              val relCdc = s"_change_data/cdc-$dv-$i.parquet"
              f.delete(new Path(s"$table/$relCdc"), false)
              require(f.rename(part, new Path(s"$table/$relCdc")),
                s"failed to install $relCdc")
              val size = len // rename preserves length — no re-stat
              val pj = {
                import scala.jdk.CollectionConverters._
                val m = new java.util.LinkedHashMap[String, String]()
                partCols.foreach(c => m.put(c,
                  vals.get(c).filter(_ != "__HIVE_DEFAULT_PARTITION__").orNull))
                mapper.writeValueAsString(m)
              }
              sb.append(s"""{"cdc":{"path":${mapper.writeValueAsString(encodePath(relCdc))},"partitionValues":$pj,"size":$size,"dataChange":false}}""").append('\n')
            }
            f.delete(new Path(staging), true)
          }
        }
        ((prev.keySet -- nowFiles.keySet) ++ dvChanged).toSeq.sorted.foreach { r =>
          val p = mapper.writeValueAsString(encodePath(r))
          sb.append(s"""{"remove":{"path":$p,"deletionTimestamp":${snap.createdAtMs},"dataChange":true}}""").append('\n')
        }
        ((nowFiles.keySet -- prev.keySet) ++ dvChanged).toSeq.sorted.foreach { r =>
          val lf = nowFiles(r)
          val p = mapper.writeValueAsString(encodePath(r))
          val pvals = {
            import scala.jdk.CollectionConverters._
            mapper.writeValueAsString(lf.partitionValues.asJava)
          }
          val stats = mapper.writeValueAsString(s"""{"numRecords":${lf.rowCount}}""")
          val dvField = dvNow.get(r).filter(_.nonEmpty).map { positions =>
            val d = DeltaDv.writeUuidDv(spark, table, positions)
            s""","deletionVector":{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}","offset":${d.offset},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
          }.getOrElse("")
          sb.append(s"""{"add":{"path":$p,"partitionValues":$pvals,"size":${lf.sizeBytes},"modificationTime":${lf.modifiedMs},"dataChange":true,"stats":$stats$dvField}}""").append('\n')
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
    // at the checkpoint (DeltaRead.writeCheckpoint). Versions whose
    // live adds carry deletion vectors are skipped — the checkpoint
    // schema cannot hold the descriptors.
    val have = DeltaRead.checkpointVersions(spark, table).toSet
    (10L to last by 10L).filterNot(have)
      .filter(dv => snapOf(dv.toInt + 1).dvFiles.isEmpty)
      .foreach(v => DeltaRead.writeCheckpoint(spark, table, Some(v)))
    last
  }
}
