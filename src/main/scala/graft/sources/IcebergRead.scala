package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for Apache Iceberg table SNAPSHOTS over the open spec
  * (iceberg.apache.org/spec — `metadata/vN.metadata.json` JSON →
  * snapshot's `manifest-list` Avro → manifest Avro entries →
  * data-file paths). The reference ships an Iceberg connector
  * (`fe/fe-core/.../connector/iceberg/`, ConnectorType ICEBERG); this
  * is the Spark-native equivalent on avro-core + Jackson, no
  * iceberg-spark runtime required.
  *
  * Field access is BY NAME off each Avro record's writer schema
  * (`manifest_path`, `status`, `data_file.file_path`), so the reader
  * accepts real Iceberg files regardless of the extra fields real
  * writers emit. Status 2 (DELETED) drops an entry; position/equality
  * delete files (format v2 row-level deletes) are out of scope —
  * append/overwrite snapshots only. Metadata is KBs on the driver;
  * the data scan is a plain pruned parquet read.
  */
object IcebergRead {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[sources] def latestMetadata(spark: SparkSession, table: String): Path = {
    val dir = new Path(s"$table/metadata")
    val f = fs(spark, table)
    if (!f.exists(dir)) throw new IllegalArgumentException(
      s"not an iceberg table (no metadata/): $table")
    val metas = f.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
    require(metas.nonEmpty, s"no *.metadata.json under $table/metadata")
    // HadoopCatalog names are v1.metadata.json, v2... UNPADDED, so a
    // lexicographic max serves v9 over v10 — parse the numeric version
    // and fall back to name order for UUID-style metadata names.
    def versionOf(p: Path): Option[Long] = {
      val stem = p.getName.stripSuffix(".metadata.json")
      val digits = if (stem.startsWith("v")) stem.drop(1) else stem.takeWhile(_.isDigit)
      if (digits.nonEmpty && digits.forall(_.isDigit)) Some(digits.toLong) else None
    }
    metas.maxBy(p => (versionOf(p).getOrElse(-1L), p.getName))
  }

  private def readAvroRecords(spark: SparkSession, path: String): Seq[GenericRecord] = {
    val f = fs(spark, path)
    val in = f.open(new Path(path))
    val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer[GenericRecord]()
      while (stream.hasNext) buf += stream.next()
      buf.toSeq
    } finally stream.close()
  }

  /** One live data file: path, manifest partition-struct values
    * (empty for unpartitioned / foreign writers without the field),
    * and the spec's size/row stats when the writer recorded them. */
  final case class DataFileEntry(path: String,
      partitionValues: Map[String, String],
      sizeBytes: Option[Long], recordCount: Option[Long])

  /** Data-file paths of a snapshot (default: current). */
  def dataFiles(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): Seq[String] =
    dataFileEntries(spark, table, snapshotId).map(_.path)

  /** Live data-file entries of a snapshot. Partition values come FROM
    * THE MANIFEST's `data_file.partition` struct — never inferred from
    * directory names (the DeltaRead lesson). */
  def dataFileEntries(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): Seq[DataFileEntry] = {
    val mapper = new ObjectMapper()
    val f = fs(spark, table)
    val metaPath = latestMetadata(spark, table)
    val in = f.open(metaPath)
    val meta = try mapper.readTree(in) finally in.close()
    val snaps = meta.get("snapshots")
    require(snaps != null && snaps.size() > 0, "metadata has no snapshots")
    val wanted = snapshotId.getOrElse(meta.get("current-snapshot-id").asLong)
    var manifestList: String = null
    snaps.forEach { s =>
      if (s.get("snapshot-id").asLong == wanted)
        manifestList = s.get("manifest-list").asText()
    }
    require(manifestList != null, s"snapshot $wanted not in metadata")
    val manifests = readAvroRecords(spark, manifestList)
      .map(_.get("manifest_path").toString)
    manifests.flatMap { m =>
      readAvroRecords(spark, m).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED
        else {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          def optLong(field: String): Option[Long] =
            if (df.getSchema.getField(field) == null) None
            else Option(df.get(field)).map(_.asInstanceOf[Long])
          val parts: Map[String, String] =
            if (df.getSchema.getField("partition") == null) Map.empty
            else Option(df.get("partition").asInstanceOf[GenericRecord]) match {
              case None => Map.empty
              case Some(p) =>
                import scala.jdk.CollectionConverters._
                p.getSchema.getFields.asScala.flatMap(fl =>
                  Option(p.get(fl.name())).map(v => fl.name() -> v.toString)).toMap
            }
          Some(DataFileEntry(df.get("file_path").toString, parts,
            optLong("file_size_in_bytes"), optLong("record_count")))
        }
      }
    }
  }

  /** The default partition spec's (name, iceberg-type) fields from the
    * latest metadata.json; empty for unpartitioned tables. */
  def partitionSpecFields(spark: SparkSession, table: String): Seq[(String, String)] = {
    val mapper = new ObjectMapper()
    val f = fs(spark, table)
    val in = f.open(latestMetadata(spark, table))
    val meta = try mapper.readTree(in) finally in.close()
    val specs = meta.get("partition-specs")
    if (specs == null || specs.size() == 0) return Nil
    val specId = Option(meta.get("default-spec-id")).map(_.asInt).getOrElse(0)
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    specs.forEach { sp =>
      if (Option(sp.get("spec-id")).map(_.asInt).getOrElse(0) == specId)
        sp.get("fields").forEach { fl =>
          val tr = Option(fl.get("transform")).map(_.asText).getOrElse("identity")
          if (tr == "identity")
            buf += fl.get("name").asText ->
              Option(fl.get("type")).map(_.asText).getOrElse("string")
        }
    }
    buf.toSeq
  }

  /** Spark DataType for an iceberg primitive type name, restricted to
    * the types the manifest-backed FileIndex can cast a partition
    * value string into. Timestamp/decimal identity partitions degrade
    * to STRING (the manifest carries the literal value; the caller
    * casts if needed) rather than failing scan planning. */
  private def sparkTypeOf(t: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    t match {
      case "long" => LongType
      case "int" => IntegerType
      case "double" => DoubleType
      case "float" => FloatType
      case "boolean" => BooleanType
      case "date" => DateType
      case _ => StringType
    }
  }

  /** Snapshot scan. Unpartitioned: plain parquet over the file set.
    * Partitioned: the data files don't store the partition columns, so
    * the scan goes through the same manifest-backed FileIndex the
    * native Lake uses — partition values and file stats come from the
    * Iceberg manifest (plus one footer read for the data schema), the
    * planner prunes partitions against the manifest, and nothing is
    * inferred from directory names. */
  def read(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): DataFrame =
    readIndexed(spark, table, snapshotId)._1

  /** As [[read]]; for partitioned tables also returns the FileIndex so
    * tests can assert the manifest-driven partition pruning. */
  def readIndexed(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): (DataFrame, Option[Lake.LakeFileIndex]) = {
    val entries = dataFileEntries(spark, table, snapshotId)
    require(entries.nonEmpty, s"snapshot has no data files: $table")
    val specFields = partitionSpecFields(spark, table)
    if (specFields.isEmpty)
      return (spark.read.parquet(entries.map(_.path): _*), None)
    val f = fs(spark, table)
    val dataSchema = spark.read.parquet(entries.head.path).schema
    val partFields = specFields.map { case (c, t) =>
      org.apache.spark.sql.types.StructField(c, sparkTypeOf(t)) }
    val fullSchema = org.apache.spark.sql.types.StructType(
      dataSchema.fields.toSeq ++ partFields)
    val lakeFiles = entries.map { e =>
      val (size, mod) = e.sizeBytes match {
        case Some(s) => (s, 0L)
        case None => // foreign manifest without stats: stat once, driver-side
          val st = f.getFileStatus(new Path(e.path))
          (st.getLen, st.getModificationTime)
      }
      Lake.LakeFile(e.path, size, mod, e.recordCount.getOrElse(0L),
        e.partitionValues)
    }
    val snap = Lake.Snapshot(
      snapshotId.getOrElse(0L).toInt, 0L, fullSchema.json,
      specFields.map(_._1), lakeFiles)
    val (df, index) = Lake.indexedDataFrame(spark, table, snap)
    (df, Some(index))
  }

  // ---- minimal spec-shaped layout writer (tests + gate) ----

  /** Entry schema for exports: data_file carries the spec's
    * `file_size_in_bytes` / `record_count` stats (so a reader plans
    * splits without stat-ing the filesystem) and, when partitioned, a
    * `partition` struct (identity values as nullable strings, one
    * field per partition column) — the spec's partition-struct shape. */
  private[sources] def manifestEntrySchemaFor(partitionCols: Seq[String]): Schema = {
    var db = SchemaBuilder.record("data_file").fields()
      .requiredString("file_path")
      .optionalLong("file_size_in_bytes")
      .optionalLong("record_count")
    if (partitionCols.nonEmpty) {
      var pb = SchemaBuilder.record("r102").fields()
      partitionCols.foreach(c => pb = pb.optionalString(c))
      db = db.name("partition").`type`(pb.endRecord()).noDefault()
    }
    SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("data_file").`type`(db.endRecord()).noDefault()
      .endRecord()
  }

  private[sources] val manifestFileSchema: Schema = SchemaBuilder.record("manifest_file")
    .fields().requiredString("manifest_path").endRecord()

  private[sources] def writeAvro(spark: SparkSession, path: String, schema: Schema,
      records: Seq[GenericRecord]): Unit = {
    val f = fs(spark, path)
    val out = f.create(new Path(path), true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
  }

  /** Append a snapshot: the DataFrame's rows become data files listed
    * by a fresh manifest + manifest list + metadata.json version.
    * `carryForward` keeps previous snapshots' files live (append);
    * without it the new snapshot replaces the table (overwrite). */
  def commitSnapshot(df: DataFrame, table: String,
      carryForward: Boolean = true): Long = {
    val spark = df.sparkSession
    val f = fs(spark, table)
    val prior = try dataFiles(spark, table, None)
      catch { case _: Exception => Nil }
    val version = {
      val dir = new Path(s"$table/metadata")
      if (!f.exists(dir)) 1L
      else f.listStatus(dir).map(_.getPath.getName)
        .filter(_.endsWith(".metadata.json"))
        .map(_.stripPrefix("v").stripSuffix(".metadata.json").toLong)
        .foldLeft(0L)(math.max) + 1
    }
    val snapId = version
    val staging = s"$table/_staging_v$version"
    df.write.mode("overwrite").parquet(staging)
    val parts = f.listStatus(new Path(staging))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath)
    val dataPaths = parts.zipWithIndex.map { case (p, i) =>
      val dest = s"$table/data/f$version-$i.parquet"
      f.mkdirs(new Path(s"$table/data"))
      f.rename(p, new Path(dest)); dest
    }.toSeq
    f.delete(new Path(staging), true)
    val live = (if (carryForward) prior else Nil) ++ dataPaths
    val entrySchema = manifestEntrySchemaFor(Nil)
    val entries = live.map { p =>
      val dfRec = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      dfRec.put("file_path", p)
      dfRec.put("file_size_in_bytes",
        Long.box(f.getFileStatus(new Path(p)).getLen))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("data_file", dfRec); e
    }
    val manifestPath = s"$table/metadata/m$version.avro"
    writeAvro(spark, manifestPath, entrySchema, entries)
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", manifestPath)
    val listPath = s"$table/metadata/snap-$snapId.avro"
    writeAvro(spark, listPath, manifestFileSchema, Seq(mf))
    val mapper = new ObjectMapper()
    // keep prior snapshots in the metadata so snapshotId time travel works
    val priorSnaps = try {
      val in = f.open(latestMetadata(spark, table))
      val meta = try mapper.readTree(in) finally in.close()
      val sb = new StringBuilder
      meta.get("snapshots").forEach(s => sb.append(mapper.writeValueAsString(s)).append(','))
      sb.toString
    } catch { case _: Exception => "" }
    val json =
      s"""{"format-version":2,"current-snapshot-id":$snapId,"snapshots":[$priorSnaps{"snapshot-id":$snapId,"manifest-list":${mapper.writeValueAsString(listPath)}}]}"""
    val out = f.create(new Path(f"$table/metadata/v$version%05d.metadata.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    snapId
  }
}
