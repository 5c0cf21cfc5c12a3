package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for Apache Hudi COPY-ON-WRITE table layouts (public format:
  * hudi.apache.org/docs/concepts — a `.hoodie/` timeline of
  * `<instant>.commit` JSON files whose write stats name the base
  * parquet files, and file groups where the LATEST base file per
  * fileId is the live slice). The reference ships a Hudi external
  * connector (`fe/fe-core/.../connector/hudi/`, ConnectorType HUDI);
  * this is the Spark-native equivalent over the open timeline format,
  * no hudi-spark bundle required.
  *
  * Replay: commits in instant order; each write stat maps fileId →
  * base file path; later commits REPLACE a file group's slice
  * (copy-on-write semantics). Snapshot read = latest slice per group,
  * scanned as plain parquet (pushdown/pruning as usual). MOR log
  * files and replacecommit/clustering are out of scope — COW
  * snapshot reads only, the 90% read path. */
object HudiRead {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Completed commit/replacecommit instants, ascending.
    * (replacecommit = Hudi's insert_overwrite/clustering action: its
    * partitionToReplaceFileIds retires whole file groups — the only
    * way a group disappears in the timeline format.) */
  def instants(spark: SparkSession, table: String): Seq[String] = {
    val dir = new Path(s"$table/.hoodie")
    val f = fs(spark, table)
    if (!f.exists(dir)) throw new IllegalArgumentException(
      s"not a hudi table (no .hoodie): $table")
    f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.endsWith(".commit") || n.endsWith(".replacecommit"))
      .map(_.stripSuffix(".replacecommit").stripSuffix(".commit"))
      .sorted.toSeq
  }

  /** A live file slice: table-relative path, the timeline's
    * partitionPath key it was written under, and the recorded size. */
  final case class Slice(path: String, partitionPath: String,
      sizeBytes: Option[Long])

  /** fileId → live base-file path at `instantAsOf` (default latest). */
  def liveSlices(spark: SparkSession, table: String,
      instantAsOf: Option[String] = None): Map[String, String] =
    liveSliceDetails(spark, table, instantAsOf).map { case (k, s) => k -> s.path }

  /** fileId → live [[Slice]] at `instantAsOf` (default latest). */
  def liveSliceDetails(spark: SparkSession, table: String,
      instantAsOf: Option[String] = None): Map[String, Slice] = {
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    val upTo = instantAsOf.getOrElse(instants(spark, table).last)
    val live = scala.collection.mutable.LinkedHashMap[String, Slice]()
    instants(spark, table).filter(_ <= upTo).foreach { i =>
      val commitP = new Path(s"$table/.hoodie/$i.commit")
      val p = if (f.exists(commitP)) commitP
        else new Path(s"$table/.hoodie/$i.replacecommit")
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val node = mapper.readTree(text)
      // replacecommit retires file groups BEFORE its own writes apply
      val replaced = node.get("partitionToReplaceFileIds")
      if (replaced != null) {
        val parts = replaced.fields()
        while (parts.hasNext) parts.next().getValue.forEach(id => live.remove(id.asText()))
      }
      val stats = node.get("partitionToWriteStats")
      if (stats != null) {
        val parts = stats.fields()
        while (parts.hasNext) {
          val entry = parts.next()
          val partitionPath = entry.getKey
          entry.getValue.forEach { ws =>
            live(ws.get("fileId").asText()) = Slice(
              ws.get("path").asText(), partitionPath,
              Option(ws.get("fileSizeInBytes")).map(_.asLong))
          }
        }
      }
    }
    live.toMap
  }

  /** Snapshot scan at an instant: latest slice per file group. */
  def read(spark: SparkSession, table: String,
      instantAsOf: Option[String] = None): DataFrame =
    readIndexed(spark, table, instantAsOf)._1

  /** As [[read]]; when the timeline is partitioned, the scan goes
    * through the manifest-backed LakeFileIndex — partition columns are
    * restored (as strings — hive path encoding is untyped) FROM THE
    * TIMELINE's partitionPath keys, partition filters prune files
    * before the scan, and the index is returned for test assertions.
    * Unpartitioned timelines keep the plain basePath read. */
  def readIndexed(spark: SparkSession, table: String,
      instantAsOf: Option[String] = None): (DataFrame, Option[Lake.LakeFileIndex]) = {
    val slices = liveSliceDetails(spark, table, instantAsOf).values.toSeq
    if (slices.isEmpty)
      throw new IllegalArgumentException(s"no live slices at $table")
    def parsePath(pp: String): Option[Seq[(String, String)]] = {
      val segs = pp.split('/').toSeq.filter(_.nonEmpty).map { seg =>
        val i = seg.indexOf('=')
        if (i <= 0) return None
        seg.substring(0, i) ->
          java.net.URLDecoder.decode(seg.substring(i + 1), "UTF-8")
      }
      Some(segs)
    }
    // the timeline-indexed path needs EVERY slice to carry a hive-style
    // col=val partitionPath over one consistent column set; foreign
    // Hudi tables often use values-only paths ('americas/brazil/…') or
    // mix partitioned and unpartitioned stats — those keep the plain
    // basePath read, which handles any directory layout
    val parsed = slices.map(s => parsePath(s.partitionPath))
    val colSets = parsed.map(_.map(_.map(_._1)))
    val uniform = colSets.forall(_.isDefined) &&
      colSets.flatten.map(_.toSet).distinct.size == 1 &&
      colSets.flatten.headOption.exists(_.nonEmpty)
    if (!uniform) {
      // basePath: slices under hive-style partition dirs (a Lake
      // export's data/commit-N/p=x/…) recover their partition columns
      return (spark.read.option("basePath", table)
        .parquet(slices.map(s => s"$table/${s.path}"): _*), None)
    }
    val partCols = parsed.head.get.map(_._1)
    val f = fs(spark, table)
    val dataSchema = spark.read.parquet(s"$table/${slices.head.path}").schema
    val fullSchema = org.apache.spark.sql.types.StructType(
      dataSchema.fields.toSeq ++ partCols.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    val lakeFiles = slices.map { s =>
      val abs = s"$table/${s.path}"
      val (size, mod) = s.sizeBytes match {
        case Some(b) => (b, 0L)
        case None =>
          val st = f.getFileStatus(new Path(abs)); (st.getLen, st.getModificationTime)
      }
      Lake.LakeFile(abs, size, mod, 0L,
        parsePath(s.partitionPath).getOrElse(Nil).toMap)
    }
    val snap = Lake.Snapshot(1, 0L, fullSchema.json, partCols, lakeFiles)
    val (df, index) = Lake.indexedDataFrame(spark, table, snap)
    (df, Some(index))
  }

  /** Minimal layout writer (one commit): each DataFrame partition of
    * `groups` becomes/replaces one file group. Exists so tests and
    * the gate can build real timeline layouts. */
  def commit(table: String, groups: Map[String, DataFrame]): String = {
    require(groups.nonEmpty, "commit needs at least one file group")
    val spark = groups.head._2.sparkSession
    val f = fs(spark, table)
    val instant = f"${instants0(spark, table).size + 1}%014d"
    val mapper = new ObjectMapper()
    val stats = groups.map { case (fileId, df) =>
      val staging = s"$table/_staging_$instant$fileId"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = f.listStatus(new Path(staging))
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      val dest = s"${fileId}_0-0-0_$instant.parquet"
      f.rename(part, new Path(s"$table/$dest"))
      f.delete(new Path(staging), true)
      s"""{"fileId":${mapper.writeValueAsString(fileId)},"path":${mapper.writeValueAsString(dest)}}"""
    }
    val json =
      s"""{"partitionToWriteStats":{"":[${stats.mkString(",")}]}}"""
    val out = f.create(new Path(s"$table/.hoodie/$instant.commit"), false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    instant
  }

  private def instants0(spark: SparkSession, table: String): Seq[String] =
    try instants(spark, table) catch { case _: IllegalArgumentException => Nil }
}
