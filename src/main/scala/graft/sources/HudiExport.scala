package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Hudi-timeline WRITE-path interop (reference HUDI connector +
  * table-sink family, `DataSinks.thrift:45-65`): materialize a
  * `.hoodie/` COW timeline beside a native Lake table over the SAME
  * data files. Each Lake data file is its own file group (fileId =
  * table-relative path); a Lake snapshot's file DIFF exports as one
  * instant — a plain `.commit` when files were only added, a
  * `.replacecommit` (Hudi's insert_overwrite/clustering action) when
  * CoW delete/update/compact retired files. Instant i = Lake version
  * i zero-padded, so instant-asOf time travel through [[HudiRead]]
  * replays the same history [[Lake.read]] serves.
  *
  * Idempotent + incremental like [[DeltaExport]]/[[IcebergExport]]:
  * existing instants are skipped; O(changed files) metadata, no data
  * copies. */
object HudiExport {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Export all not-yet-exported Lake snapshots as timeline instants.
    * Returns the latest instant string. */
  def exportHudiTimeline(spark: SparkSession, table: String): String = {
    val cur = Lake.currentVersion(spark, table)
    require(cur > 0, s"no committed Lake version at $table")
    require(Lake.readSnapshot(spark, table, cur).partitionCols.isEmpty,
      "HudiExport: partitioned Lake tables are not exportable — " +
      "partitionPath mapping is out of scope; use DeltaExport " +
      "(partition values ride in the log) for partitioned tables")
    val f = fs(spark, table)
    val qualified = f.makeQualified(new Path(table)).toString
    val mapper = new ObjectMapper()
    def rel(p: String): String = {
      val r = p.stripPrefix(s"$qualified/").stripPrefix(s"$table/")
      require(!r.contains(":"), s"cannot relativize $p against $qualified")
      r
    }
    f.mkdirs(new Path(s"$table/.hoodie"))
    var last = ""
    (1 to cur).foreach { v =>
      val instant = f"$v%014d"
      last = instant
      val commitP = new Path(s"$table/.hoodie/$instant.commit")
      val replaceP = new Path(s"$table/.hoodie/$instant.replacecommit")
      if (!f.exists(commitP) && !f.exists(replaceP)) {
        val now = Lake.readSnapshot(spark, table, v).files.map(x => rel(x.path)).toSet
        val prev: Set[String] =
          if (v == 1) Set.empty
          else Lake.readSnapshot(spark, table, v - 1).files.map(x => rel(x.path)).toSet
        val added = (now -- prev).toSeq.sorted
        val removed = (prev -- now).toSeq.sorted
        val stats = added.map { r =>
          s"""{"fileId":${mapper.writeValueAsString(r)},"path":${mapper.writeValueAsString(r)}}"""
        }
        val body = new StringBuilder("{")
        if (removed.nonEmpty) {
          val ids = removed.map(mapper.writeValueAsString).mkString(",")
          body.append(s""""partitionToReplaceFileIds":{"":[$ids]},""")
        }
        body.append(s""""partitionToWriteStats":{"":[${stats.mkString(",")}]}}""")
        val target = if (removed.nonEmpty) replaceP else commitP
        val out = f.create(target, false)
        try out.write(body.toString.getBytes("UTF-8")) finally out.close()
      }
    }
    last
  }
}
