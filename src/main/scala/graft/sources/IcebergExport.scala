package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.generic.GenericData
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Iceberg-protocol WRITE-path interop (reference ICEBERG_TABLE_SINK,
  * `gensrc/thrift/DataSinks.thrift:45-65`): materialize spec-shaped
  * Iceberg metadata (metadata.json → manifest-list Avro → manifest
  * Avro) beside a native Lake table, pointing at the EXISTING Lake
  * data files by full path — Iceberg manifests store absolute paths,
  * so no data is copied or rewritten. Each Lake snapshot v exports as
  * Iceberg snapshot-id v with the metadata chain preserved, so
  * snapshot-id time travel through [[IcebergRead]] sees the same
  * history [[Lake.read]] serves from its own manifests.
  *
  * Like [[DeltaExport]], the export is idempotent and incremental
  * (already-exported versions are skipped) — an O(files-per-snapshot)
  * metadata write at any data scale. */
object IcebergExport {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Export all not-yet-exported Lake snapshots as Iceberg snapshots.
    * Returns the latest exported snapshot id. */
  def exportIcebergMeta(spark: SparkSession, table: String): Long = {
    val cur = Lake.currentVersion(spark, table)
    require(cur > 0, s"no committed Lake version at $table")
    require(Lake.readSnapshot(spark, table, cur).partitionCols.isEmpty,
      "IcebergExport: partitioned Lake tables are not exportable — the " +
      "reader does not map manifest partition structs; use DeltaExport " +
      "(partition values ride in the log) for partitioned tables")
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    (1 to cur).foreach { v =>
      val metaPath = new Path(f"$table/metadata/v$v%05d.metadata.json")
      if (!f.exists(metaPath)) {
        val snap = Lake.readSnapshot(spark, table, v)
        val entries = snap.files.map { lf =>
          val dfRec = new GenericData.Record(
            IcebergRead.manifestEntrySchema.getField("data_file").schema())
          dfRec.put("file_path", lf.path)
          val e = new GenericData.Record(IcebergRead.manifestEntrySchema)
          e.put("status", 1); e.put("data_file", dfRec); e
        }
        val manifestPath = s"$table/metadata/m$v.avro"
        IcebergRead.writeAvro(spark, manifestPath,
          IcebergRead.manifestEntrySchema, entries)
        val mf = new GenericData.Record(IcebergRead.manifestFileSchema)
        mf.put("manifest_path", manifestPath)
        val listPath = s"$table/metadata/snap-$v.avro"
        IcebergRead.writeAvro(spark, listPath,
          IcebergRead.manifestFileSchema, Seq(mf))
        // carry the prior snapshot chain forward for time travel
        val priorSnaps =
          if (v == 1) ""
          else {
            val in = f.open(new Path(f"$table/metadata/v${v - 1}%05d.metadata.json"))
            val meta = try mapper.readTree(in) finally in.close()
            val sb = new StringBuilder
            meta.get("snapshots").forEach(s =>
              sb.append(mapper.writeValueAsString(s)).append(','))
            sb.toString
          }
        val json = s"""{"format-version":2,"current-snapshot-id":$v,"snapshots":[$priorSnaps{"snapshot-id":$v,"manifest-list":${mapper.writeValueAsString(listPath)}}]}"""
        // exclusive create — the same OCC commit primitive as
        // DeltaExport/LakeTx: a racing exporter conflicts instead of
        // silently clobbering an already-published metadata version
        val out =
          try f.create(metaPath, false)
          catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            throw new IllegalStateException(
              s"concurrent Iceberg export detected at $metaPath — retry")
          }
        try out.write(json.getBytes("UTF-8")) finally out.close()
      }
    }
    cur.toLong
  }
}
