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

  /** Iceberg primitive type name for a partition-source Spark type —
    * recorded per spec field so [[IcebergRead]] can restore the typed
    * partition column from the manifest's (string-valued) struct. */
  private def icebergType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType => "long"
    case org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.ByteType => "int"
    case org.apache.spark.sql.types.DoubleType => "double"
    case org.apache.spark.sql.types.FloatType => "float"
    case org.apache.spark.sql.types.BooleanType => "boolean"
    case org.apache.spark.sql.types.DateType => "date"
    case org.apache.spark.sql.types.TimestampType => "timestamp"
    case d: org.apache.spark.sql.types.DecimalType => s"decimal(${d.precision},${d.scale})"
    case _ => "string"
  }

  /** Write a TRANSFORM-partitioned Iceberg table (format v2) from a
    * DataFrame — the ecosystem-default layouts (`days(ts)`,
    * `bucket(N, id)`, `truncate(W, s)`) that [[exportIcebergMeta]]'s
    * identity-only path cannot produce. `specs` maps source column →
    * transform string ([[IcebergTransforms.parse]] syntax). Unlike the
    * Lake export, data files KEEP every source column (the Iceberg
    * norm — the partition struct is derivable metadata, not storage),
    * so a reader needs no column re-attachment; the manifest's
    * partition struct carries the transformed values and the
    * metadata.json records the spec (with a `schemas` section so
    * `source-id` resolves) for [[IcebergRead.readPruned]]'s
    * transform-aware file skipping.
    *
    * Scale shape: one shuffle-free `partitionBy` write (the transform
    * columns are computed per-row, codegen except the murmur3 bucket
    * UDF), manifest metadata is O(files) on the driver. `carryForward`
    * appends to the prior snapshot's live set; without it the new
    * snapshot replaces the table. Returns the snapshot id. */
  def commitTransformSnapshot(df: org.apache.spark.sql.DataFrame,
      table: String, specs: Seq[(String, String)],
      carryForward: Boolean = true): Long = {
    import org.apache.spark.sql.functions.col
    import IcebergTransforms.{Transform => Tr}
    require(specs.nonEmpty, "no partition spec — use commitSnapshot")
    val spark = df.sparkSession
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    val parsed: Seq[(String, Tr)] = specs.map { case (src, t) =>
      require(df.columns.contains(src), s"unknown source column $src")
      (src, IcebergTransforms.parse(t))
    }
    val ptCols = parsed.indices.map(i => s"__pt$i")
    val staged = parsed.zip(ptCols).foldLeft(df) { case (d, ((src, t), pc)) =>
      d.withColumn(pc,
        IcebergTransforms.applyColumn(t, df.schema(src).dataType, col(src)))
    }
    val version = IcebergRead.nextVersion(f, table)
    val staging = s"$table/_staging_tr$version"
    staged.write.partitionBy(ptCols: _*).mode("overwrite").parquet(staging)
    // walk the hive layout: each data file sits under
    // __pt0=<v>/.../__ptN=<v>; dir values are hive-escaped
    // %XX-only decode: Spark's dir-name escaping leaves '+' literal,
    // URLDecoder would turn it into a space
    def unescape(s: String): String = PathNames.unescapePathName(s)
    val found = scala.collection.mutable.ArrayBuffer[(Path, Long, Seq[String])]()
    def walk(p: Path, vals: List[String]): Unit =
      f.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.contains("="))
          walk(st.getPath, unescape(name.substring(name.indexOf('=') + 1)) :: vals)
        else if (name.endsWith(".parquet"))
          found += ((st.getPath, st.getLen, vals.reverse))
      }
    walk(new Path(staging), Nil)
    require(found.nonEmpty, "transform write produced no data files")
    f.mkdirs(new Path(s"$table/data"))
    val partNames = parsed.map { case (src, t) => IcebergTransforms.fieldName(src, t) }
    val entrySchema = IcebergRead.manifestEntrySchemaFor(partNames)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val entries = found.zipWithIndex.map { case ((p, len, vals), i) =>
      val dest = s"$table/data/t$version-$i.parquet"
      require(f.rename(p, new Path(dest)),
        s"failed to install $dest")
      val dfRec = new GenericData.Record(dataFileSchema)
      dfRec.put("file_path", dest)
      dfRec.put("file_size_in_bytes", Long.box(len)) // rename preserves length
      val pRec = new GenericData.Record(dataFileSchema.getField("partition").schema())
      partNames.zip(vals).foreach { case (n, v) =>
        pRec.put(n, if (v == "__HIVE_DEFAULT_PARTITION__") null else v) }
      dfRec.put("partition", pRec)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("data_file", dfRec); e
    }.toSeq
    f.delete(new Path(staging), true)
    val manifestPath = s"$table/metadata/tm$version.avro"
    IcebergRead.writeAvro(spark, manifestPath, entrySchema, entries)
    val priorManifests: Seq[(String, Int, Long)] =
      if (!carryForward || version == 1L) Nil
      else IcebergRead.manifestTriples(spark, table, None)
    val seq = priorManifests.map(_._3).foldLeft(0L)(math.max) + 1
    def listEntry(m: String, content: Int, s: Long) = {
      val r = new GenericData.Record(IcebergRead.manifestFileSchema)
      r.put("manifest_path", m); r.put("content", Int.box(content))
      r.put("sequence_number", Long.box(s)); r
    }
    val listPath = s"$table/metadata/snap-tr$version.avro"
    IcebergRead.writeAvro(spark, listPath, IcebergRead.manifestFileSchema,
      priorManifests.map(p => listEntry(p._1, p._2, p._3)) :+
        listEntry(manifestPath, 0, seq))
    // schemas section with field ids so partition-spec source-id
    // resolves (the spec's requirement; readers map id -> name)
    val fieldIds = df.schema.fields.zipWithIndex.map { case (fd, i) => fd.name -> (i + 1) }.toMap
    val schemaFields = df.schema.fields.zipWithIndex.map { case (fd, i) =>
      s"""{"id":${i + 1},"name":${mapper.writeValueAsString(fd.name)},"required":false,"type":${mapper.writeValueAsString(icebergType(fd.dataType))}}"""
    }.mkString(",")
    val specFields = parsed.zipWithIndex.map { case ((src, t), i) =>
      val srcT = icebergType(df.schema(src).dataType)
      s"""{"name":${mapper.writeValueAsString(IcebergTransforms.fieldName(src, t))},"transform":"${IcebergTransforms.render(t)}","source-id":${fieldIds(src)},"field-id":${1000 + i},"type":${mapper.writeValueAsString(IcebergTransforms.resultType(t, srcT))}}"""
    }.mkString(",")
    val priorSnaps =
      if (version == 1L) ""
      else {
        val in = f.open(IcebergRead.latestMetadata(spark, table))
        val meta = try mapper.readTree(in) finally in.close()
        val sb = new StringBuilder
        meta.get("snapshots").forEach(s =>
          sb.append(mapper.writeValueAsString(s)).append(','))
        sb.toString
      }
    val json = s"""{"format-version":2,"schemas":[{"type":"struct","schema-id":0,"fields":[$schemaFields]}],"current-schema-id":0,"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[$specFields]}],"current-snapshot-id":$version,"snapshots":[$priorSnaps{"snapshot-id":$version,"manifest-list":${mapper.writeValueAsString(listPath)}}]}"""
    val metaPath = new Path(f"$table/metadata/v$version%05d.metadata.json")
    try AtomicPublish.publish(spark, metaPath, json.getBytes("UTF-8"))
    catch { case e: java.util.ConcurrentModificationException =>
      throw new IllegalStateException(
        s"concurrent Iceberg commit detected at $metaPath — retry", e)
    }
    version
  }

  /** Export all not-yet-exported Lake snapshots as Iceberg snapshots.
    * Returns the latest exported snapshot id.
    *
    * Partitioned tables: the Lake manifest's per-file partition values
    * are mapped into a `partition` struct on each `data_file` entry
    * (identity transforms — Lake partitions are identity-partitioned),
    * and the metadata.json carries the matching `partition-specs`
    * entry, so a reader restores the typed partition columns FROM THE
    * MANIFEST, never from directory-name inference. */
  def exportIcebergMeta(spark: SparkSession, table: String): Long = {
    val cur = Lake.currentVersion(spark, table)
    require(cur > 0, s"no committed Lake version at $table")
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    (1 to cur).foreach { v =>
      val metaPath = new Path(f"$table/metadata/v$v%05d.metadata.json")
      if (!f.exists(metaPath)) {
        val snap = Lake.readSnapshot(spark, table, v)
        val partCols = snap.partitionCols
        val entrySchema = IcebergRead.manifestEntrySchemaFor(partCols)
        val dataFileSchema = entrySchema.getField("data_file").schema()
        val entries = snap.files.map { lf =>
          val dfRec = new GenericData.Record(dataFileSchema)
          dfRec.put("file_path", lf.path)
          dfRec.put("file_size_in_bytes", Long.box(lf.sizeBytes))
          dfRec.put("record_count", Long.box(lf.rowCount))
          if (partCols.nonEmpty) {
            val pRec = new GenericData.Record(
              dataFileSchema.getField("partition").schema())
            partCols.foreach(c => pRec.put(c, lf.partitionValues.getOrElse(c, null)))
            dfRec.put("partition", pRec)
          }
          val e = new GenericData.Record(entrySchema)
          e.put("status", 1); e.put("data_file", dfRec); e
        }
        val manifestPath = s"$table/metadata/m$v.avro"
        IcebergRead.writeAvro(spark, manifestPath, entrySchema, entries)
        val mf = new GenericData.Record(IcebergRead.manifestFileSchema)
        mf.put("manifest_path", manifestPath)
        // pending delete vectors export as format v2 POSITION DELETES:
        // the sidecars' (_metadata-rendered file, pos) rows translate
        // to manifest-form data-file paths through a driver-built
        // exact-string table (bounded by #files), land as ONE sorted
        // (file_path, pos) parquet, and are listed by a content=1
        // delete manifest — so an Iceberg v2 reader sees exactly the
        // rows Lake.read serves, no fold required before export
        val listEntries = if (snap.dvFiles.isEmpty) Seq(mf) else {
          import org.apache.spark.sql.functions.{broadcast, col}
          val dvSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__graft_dv_file",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("__graft_dv_pos",
              org.apache.spark.sql.types.LongType)))
          val dv = spark.read.schema(dvSchema).parquet(snap.dvFiles: _*)
          val targets = dv.select("__graft_dv_file").distinct()
            .collect().map(_.getString(0))
          val byNorm = snap.files.map(lf =>
            IcebergRead.normPath(lf.path) -> lf.path).toMap
          import spark.implicits._
          val trans = targets.toSeq.flatMap(t =>
            byNorm.get(IcebergRead.normPath(t)).map(raw => (t, raw)))
            .toDF("__graft_dv_file", "file_path")
          val staging = s"$table/metadata/_pdel_stage_$v"
          dv.join(broadcast(trans), Seq("__graft_dv_file"))
            .select(col("file_path"), col("__graft_dv_pos").as("pos"))
            .repartition(1).sortWithinPartitions(col("file_path"), col("pos"))
            .write.mode("overwrite").parquet(staging)
          val delPath = s"$table/metadata/pdel-$v.parquet"
          val part = f.listStatus(new Path(staging))
            .filter(_.getPath.getName.endsWith(".parquet")).head
          f.delete(new Path(delPath), false)
          require(f.rename(part.getPath, new Path(delPath)),
            s"failed to install $delPath")
          f.delete(new Path(staging), true)
          val delEntrySchema = IcebergRead.manifestEntrySchemaFor(Nil)
          val dfRec = new GenericData.Record(
            delEntrySchema.getField("data_file").schema())
          dfRec.put("file_path", delPath)
          dfRec.put("file_size_in_bytes", Long.box(part.getLen)) // rename preserves length
          val e = new GenericData.Record(delEntrySchema)
          e.put("status", 1); e.put("data_file", dfRec)
          val delManifest = s"$table/metadata/dm$v.avro"
          IcebergRead.writeAvro(spark, delManifest, delEntrySchema, Seq(e))
          val dmf = new GenericData.Record(IcebergRead.manifestFileSchema)
          dmf.put("manifest_path", delManifest)
          dmf.put("content", Int.box(1))
          Seq(mf, dmf)
        }
        val listPath = s"$table/metadata/snap-$v.avro"
        IcebergRead.writeAvro(spark, listPath,
          IcebergRead.manifestFileSchema, listEntries)
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
        val specJson =
          if (partCols.isEmpty) ""
          else {
            val schema = snap.schema
            val fields = partCols.map { c =>
              val dt = schema.fields.find(_.name == c)
                .map(_.dataType).getOrElse(org.apache.spark.sql.types.StringType)
              s"""{"name":${mapper.writeValueAsString(c)},"transform":"identity","type":${mapper.writeValueAsString(icebergType(dt))}}"""
            }.mkString(",")
            s""""default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[$fields]}],"""
          }
        val json = s"""{"format-version":2,$specJson"current-snapshot-id":$v,"snapshots":[$priorSnaps{"snapshot-id":$v,"manifest-list":${mapper.writeValueAsString(listPath)}}]}"""
        // AtomicPublish — the shared torn-read-free OCC primitive: a
        // racing exporter conflicts instead of silently clobbering an
        // already-published metadata version
        try AtomicPublish.publish(spark, metaPath, json.getBytes("UTF-8"))
        catch { case e: java.util.ConcurrentModificationException =>
          throw new IllegalStateException(
            s"concurrent Iceberg export detected at $metaPath — retry", e)
        }
      }
    }
    cur.toLong
  }
}
