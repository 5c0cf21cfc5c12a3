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

  /** Next commit version: max over PARSEABLE metadata versions + 1.
    * UUID-style metadata names (foreign writers) parse to None and are
    * ignored rather than crashing the append — same digit tolerance as
    * [[latestMetadata]]. */
  private[sources] def nextVersion(f: org.apache.hadoop.fs.FileSystem, table: String): Long = {
    val dir = new Path(s"$table/metadata")
    if (!f.exists(dir)) 1L
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".metadata.json"))
      .flatMap { n =>
        val stem = n.stripSuffix(".metadata.json")
        val digits = if (stem.startsWith("v")) stem.drop(1) else stem.takeWhile(_.isDigit)
        if (digits.nonEmpty && digits.forall(_.isDigit)) Some(digits.toLong) else None
      }
      .foldLeft(0L)(math.max) + 1
  }

  private[graft] def readAvroRecords(spark: SparkSession, path: String): Seq[GenericRecord] = {
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
    * the spec's size/row stats when the writer recorded them, the
    * file's data sequence number (0 when the writer never emitted
    * one), and the data_file `content` code (0 data, 1 position
    * deletes, 2 equality deletes). */
  final case class DataFileEntry(path: String,
      partitionValues: Map[String, String],
      sizeBytes: Option[Long], recordCount: Option[Long],
      seq: Long = 0L, fileContent: Int = 0)

  /** Data-file paths of a snapshot (default: current). */
  def dataFiles(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): Seq[String] =
    dataFileEntries(spark, table, snapshotId).map(_.path)

  /** Manifest (path, content, sequenceNumber) triples of a snapshot's
    * manifest list — content 0 = data manifest, 1 = delete manifest
    * (format v2 `manifest_file.content`); both fields read BY NAME so
    * v1 lists and foreign writers without them default to data /
    * sequence 0. */
  private def manifestsOf(spark: SparkSession, table: String,
      snapshotId: Option[Long]): Seq[(String, Int, Long)] = {
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
    readAvroRecords(spark, manifestList).map { mf =>
      def optField[A](name: String): Option[A] =
        if (mf.getSchema.getField(name) == null) None
        else Option(mf.get(name)).map(_.asInstanceOf[A])
      (mf.get("manifest_path").toString,
        optField[Int]("content").getOrElse(0),
        optField[Long]("sequence_number").getOrElse(0L))
    }
  }

  /** Manifest entries; per-entry `sequence_number` when the writer
    * recorded one, else inherited from the manifest-list entry (the
    * spec's sequence-number inheritance). */
  private def entriesOf(spark: SparkSession, manifest: String,
      inheritSeq: Long = 0L): Seq[DataFileEntry] =
    readAvroRecords(spark, manifest).flatMap { entry =>
      val status = entry.get("status").asInstanceOf[Int]
      if (status == 2) None // DELETED
      else {
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        def optLong(rec: GenericRecord, field: String): Option[Long] =
          if (rec.getSchema.getField(field) == null) None
          else Option(rec.get(field)).map(_.asInstanceOf[Long])
        val parts: Map[String, String] =
          if (df.getSchema.getField("partition") == null) Map.empty
          else Option(df.get("partition").asInstanceOf[GenericRecord]) match {
            case None => Map.empty
            case Some(p) =>
              import scala.jdk.CollectionConverters._
              p.getSchema.getFields.asScala.flatMap(fl =>
                Option(p.get(fl.name())).map(v => fl.name() -> v.toString)).toMap
          }
        val fileContent =
          if (df.getSchema.getField("content") == null) 0
          else Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
        Some(DataFileEntry(df.get("file_path").toString, parts,
          optLong(df, "file_size_in_bytes"), optLong(df, "record_count"),
          optLong(entry, "sequence_number").getOrElse(inheritSeq), fileContent))
      }
    }

  /** Live data-file entries of a snapshot. Partition values come FROM
    * THE MANIFEST's `data_file.partition` struct — never inferred from
    * directory names (the DeltaRead lesson). */
  def dataFileEntries(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): Seq[DataFileEntry] =
    manifestsOf(spark, table, snapshotId).filter(_._2 == 0)
      .flatMap(m => entriesOf(spark, m._1, m._3))

  /** [[manifestsOf]] for sibling writers that carry prior manifests
    * forward ([[IcebergExport.commitTransformSnapshot]]). */
  private[sources] def manifestTriples(spark: SparkSession, table: String,
      snapshotId: Option[Long]): Seq[(String, Int, Long)] =
    manifestsOf(spark, table, snapshotId)

  /** Position-delete files of a snapshot (format v2 merge-on-read:
    * parquet files of (`file_path`, `pos`) rows recording deleted
    * row ordinals, listed by content=1 delete manifests). Entries
    * whose data_file `content` says equality (2) are excluded. Empty
    * for v1 / append-only tables. */
  def positionDeleteFiles(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): Seq[String] =
    manifestsOf(spark, table, snapshotId).filter(_._2 == 1)
      .flatMap(m => entriesOf(spark, m._1, m._3))
      .filter(_.fileContent != 2).map(_.path)

  /** Equality-delete files of a snapshot: (path, sequenceNumber)
    * pairs from content=1 delete manifests whose data_file `content`
    * is 2 — the Flink-CDC-style MoR encoding where a delete row's
    * KEY VALUES erase every matching row in data files with a LOWER
    * sequence number (the file's own re-inserted rows, sequenced at
    * or above the delete, survive). */
  def equalityDeleteFiles(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): Seq[(String, Long)] =
    manifestsOf(spark, table, snapshotId).filter(_._2 == 1)
      .flatMap(m => entriesOf(spark, m._1, m._3))
      .filter(_.fileContent == 2).map(e => (e.path, e.seq))

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

  /** One field of the default partition spec, TRANSFORM-AWARE:
    * `sourceName` resolves through the metadata's `schemas` section
    * (source-id → field name); identity fields without a schemas
    * section (this repo's Lake export predates it) fall back to the
    * spec-field name, which identity makes equal by construction. */
  final case class SpecField(name: String,
      transform: IcebergTransforms.Transform,
      sourceName: Option[String], resultType: String)

  /** The full default partition spec — every field including
    * year/month/day/hour/bucket/truncate transforms (the identity-only
    * view is [[partitionSpecFields]], kept for the Lake-export read
    * path whose data files lack the partition columns). */
  def partitionSpecFull(spark: SparkSession, table: String): Seq[SpecField] = {
    val mapper = new ObjectMapper()
    val f = fs(spark, table)
    val in = f.open(latestMetadata(spark, table))
    val meta = try mapper.readTree(in) finally in.close()
    val specs = meta.get("partition-specs")
    if (specs == null || specs.size() == 0) return Nil
    // schemas: field id -> name (current schema)
    val idToName = scala.collection.mutable.Map[Int, String]()
    val schemas = meta.get("schemas")
    if (schemas != null) {
      val curId = Option(meta.get("current-schema-id")).map(_.asInt).getOrElse(0)
      schemas.forEach { sc =>
        if (Option(sc.get("schema-id")).map(_.asInt).getOrElse(0) == curId) {
          val flds = sc.get("fields")
          if (flds != null) flds.forEach(fl =>
            idToName(fl.get("id").asInt) = fl.get("name").asText)
        }
      }
    }
    val specId = Option(meta.get("default-spec-id")).map(_.asInt).getOrElse(0)
    val buf = scala.collection.mutable.ArrayBuffer[SpecField]()
    specs.forEach { sp =>
      if (Option(sp.get("spec-id")).map(_.asInt).getOrElse(0) == specId)
        sp.get("fields").forEach { fl =>
          val trStr = Option(fl.get("transform")).map(_.asText).getOrElse("identity")
          val tr = try Some(IcebergTransforms.parse(trStr)) catch {
            case _: IllegalArgumentException => None // void etc: unprunable, keep files
          }
          tr.foreach { t =>
            val name = fl.get("name").asText
            val src = Option(fl.get("source-id")).map(_.asInt).flatMap(idToName.get)
              .orElse(if (t.kind == "identity") Some(name) else None)
            buf += SpecField(name, t, src,
              Option(fl.get("type")).map(_.asText).getOrElse("string"))
          }
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

  /** Decoded absolute path — the normalization both manifest-raw
    * (`FileStatus.toString`) and `_metadata.file_path` (percent-
    * encoded URI) renderings reduce to, so the two can be compared
    * (the `Lake.dvDirtyPaths` convention). */
  private[sources] def normPath(s: String): String =
    java.net.URLDecoder.decode(new Path(s).toUri.getPath, "UTF-8")

  /** The `_metadata.file_path` rendering of a manifest-raw path:
    * scheme (+ authority when present) + percent-encoded path — what
    * Spark's parquet reader reports for the file, reconstructed so
    * delete rows can be translated to the scan's join key without a
    * per-row decode on the data side. Scheme-less manifest paths are
    * filesystem-qualified first (the scan always reports a scheme);
    * an EMPTY authority normalizes away (Spark's listing renders
    * `file:/…`, not `file:///…`). Verified against a real scan in
    * IcebergReadSpec (path with spaces). */
  private[sources] def metaRendering(spark: SparkSession, raw: String): String = {
    val u = fs(spark, raw).makeQualified(new Path(raw)).toUri
    val auth = Option(u.getAuthority).filter(_.nonEmpty).orNull
    new java.net.URI(u.getScheme, auth, u.getPath, null, null).toString
  }

  /** Mask a (file, pos)-tagged data scan with position-delete rows:
    * translate each delete row's manifest-form `file_path` to the
    * `_metadata.file_path` rendering through a driver-built (bounded
    * by #files) exact-string translation table, then broadcast
    * anti-join on the scan's `__if`/`__ip` tag columns — the delete
    * side is batch-scale by the MoR contract. */
  private def maskPositionDeletes(spark: SparkSession, df: DataFrame,
      entries: Seq[DataFileEntry], deleteFiles: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val delSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType)))
    val dels = spark.read.schema(delSchema).parquet(deleteFiles: _*)
    // distinct target strings are ≤ #files — driver-resident by design
    val targets = dels.select("file_path").distinct()
      .collect().map(_.getString(0))
    val byNorm = entries.map(e => normPath(e.path) -> e.path).toMap
    import spark.implicits._
    val trans = targets.toSeq.flatMap(t =>
      byNorm.get(normPath(t)).map(raw => (t, metaRendering(spark, raw))))
      .toDF("file_path", "__meta_file")
    val keyed = dels.join(broadcast(trans), Seq("file_path"))
      .select(col("__meta_file").as("__if"), col("pos").as("__ip"))
    df.join(broadcast(keyed), Seq("__if", "__ip"), "left_anti")
  }

  /** Mask a data scan with equality-delete rows: the scan is tagged
    * with its file's sequence number through a driver-built
    * (metadata-rendered path → seq) broadcast table, delete files are
    * grouped by their key-column signature (spec-conformant equality
    * deletes carry exactly the equality columns), and each group
    * null-safe anti-joins on the keys with the residual condition
    * `dataSeq < deleteSeq` — so a CDC upsert's re-inserted row
    * (sequenced at the delete or above) survives its own delete. */
  private def maskEqualityDeletes(spark: SparkSession, df: DataFrame,
      entries: Seq[DataFileEntry], eqDels: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    import spark.implicits._
    val trans = entries.map(e => (metaRendering(spark, e.path), e.seq))
      .toDF("__if", "__ieseq")
    var cur = df.join(broadcast(trans), Seq("__if"), "left")
    val byKeys = eqDels.groupBy { case (p, _) =>
      spark.read.parquet(p).columns.toSeq.sorted }
    byKeys.foreach { case (keys, files) =>
      val dels = files.map { case (p, s) =>
        spark.read.parquet(p)
          .select(keys.map(k => col(k).as(s"__ied_$k")): _*)
          .withColumn("__iedseq", lit(s))
      }.reduce(_ unionByName _)
      val cond = keys.map(k => cur(k) <=> dels(s"__ied_$k"))
        .reduce(_ && _) && cur("__ieseq") < dels("__iedseq")
      cur = cur.join(broadcast(dels), cond, "left_anti")
    }
    cur.drop("__ieseq")
  }

  /** Clean/dirty split + delete masking shared by the unpartitioned
    * and manifest-indexed scans: files untouched by position deletes
    * and sequenced at-or-above every equality delete scan at full
    * speed; only the dirty subset pays the anti-joins. */
  private def maskedScan(spark: SparkSession, entries: Seq[DataFileEntry],
      posFiles: Seq[String], eqDels: Seq[(String, Long)])(
      mk: Seq[DataFileEntry] => DataFrame): DataFrame = {
    if (posFiles.isEmpty && eqDels.isEmpty) return mk(entries)
    val posDirty: Set[String] =
      if (posFiles.isEmpty) Set.empty
      else {
        val delSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("file_path",
            org.apache.spark.sql.types.StringType)))
        spark.read.schema(delSchema).parquet(posFiles: _*)
          .select("file_path").distinct().collect()
          .map(r => normPath(r.getString(0))).toSet
      }
    val maxEq = if (eqDels.isEmpty) Long.MinValue else eqDels.map(_._2).max
    val (dirty, clean) = entries.partition(e =>
      posDirty.contains(normPath(e.path)) || e.seq < maxEq)
    val cleanDf = if (clean.isEmpty) None else Some(mk(clean))
    val dirtyDf = if (dirty.isEmpty) None else {
      import org.apache.spark.sql.functions.col
      // tag ONCE off the raw scan — _metadata resolves only on the
      // relation itself, not through the mask joins' projections
      var d = mk(dirty)
        .withColumn("__if", col("_metadata.file_path"))
        .withColumn("__ip", col("_metadata.row_index"))
      if (posFiles.nonEmpty) d = maskPositionDeletes(spark, d, dirty, posFiles)
      if (eqDels.nonEmpty) d = maskEqualityDeletes(spark, d, dirty, eqDels)
      Some(d.drop("__if", "__ip"))
    }
    (cleanDf, dirtyDf) match {
      case (Some(c), Some(d)) => c.unionByName(d)
      case (Some(c), None) => c
      case (None, Some(d)) => d
      case (None, None) => mk(entries)
    }
  }

  /** As [[read]]; for partitioned tables also returns the FileIndex so
    * tests can assert the manifest-driven partition pruning. When the
    * snapshot carries position- or equality-delete files (format v2
    * merge-on-read) the scan splits at plan time: files without
    * deletes scan at full speed, only the dirty subset pays the
    * anti-joins — the same clean/dirty split [[Lake.readIndexed]]
    * uses. */
  def readIndexed(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): (DataFrame, Option[Lake.LakeFileIndex]) = {
    val entries = dataFileEntries(spark, table, snapshotId)
    require(entries.nonEmpty, s"snapshot has no data files: $table")
    val deleteFiles = positionDeleteFiles(spark, table, snapshotId)
    val eqDels = equalityDeleteFiles(spark, table, snapshotId)
    // transform-partitioned tables (any non-identity spec field, no
    // row-level deletes) route through the TransformFileIndex so a
    // plain read().filter(...) prunes files automatically
    if (deleteFiles.isEmpty && eqDels.isEmpty &&
        partitionSpecFull(spark, table).exists(_.transform.kind != "identity"))
      return (readTransformIndexed(spark, table, snapshotId)._1, None)
    val specFields = partitionSpecFields(spark, table)
    if (specFields.isEmpty)
      return (maskedScan(spark, entries, deleteFiles, eqDels)(es =>
        spark.read.parquet(es.map(_.path): _*)), None)
    val f = fs(spark, table)
    val dataSchema = spark.read.parquet(entries.head.path).schema
    // the Iceberg NORM keeps identity source columns IN the data files
    // (partition values are derivable metadata) — real-engine tables
    // and [[IcebergReal]] look like this; attaching manifest values on
    // top would duplicate the columns. Prune through the transform
    // index (identity is a transform) instead of re-attaching; the
    // attach path below remains for the Lake export's stripped layout.
    if (specFields.forall { case (c, _) => dataSchema.fieldNames.contains(c) }) {
      if (deleteFiles.isEmpty && eqDels.isEmpty)
        return (readTransformIndexed(spark, table, snapshotId)._1, None)
      return (maskedScan(spark, entries, deleteFiles, eqDels)(es =>
        spark.read.parquet(es.map(_.path): _*)), None)
    }
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
    if (deleteFiles.isEmpty && eqDels.isEmpty) {
      val (df, index) = Lake.indexedDataFrame(spark, table, snap)
      return (df, Some(index))
    }
    // partitioned + deletes: clean/dirty split through the
    // manifest-backed FileIndex, mask only the dirty subset
    val lfByPath = lakeFiles.map(lf => lf.path -> lf).toMap
    val (_, index) = Lake.indexedDataFrame(spark, table, snap)
    val merged = maskedScan(spark, entries, deleteFiles, eqDels)(es =>
      Lake.indexedDataFrame(spark, table,
        snap.copy(files = es.map(e => lfByPath(e.path))))._1)
    (merged, Some(index))
  }

  /** Result of a transform-pruned scan: the (already filtered) frame
    * plus the file-skip evidence. */
  final case class PrunedScan(df: DataFrame, keptFiles: Int, totalFiles: Int)

  /** FileIndex over a TRANSFORM-partitioned snapshot's data files —
    * the automatic twin of [[readPruned]]: pushed data filters reach
    * [[listFiles]] as resolved Catalyst conjuncts, are converted into
    * partition-struct constraints through the SAME
    * [[transformEntryPredicates]] core, and non-matching files never
    * enter the scan. `Lake.read`-style usage —
    * `IcebergRead.read(...).filter($"ts" === d)` — therefore prunes
    * `days(ts)`-partitioned tables with no dedicated API, the
    * BloomIndex/BitmapIndex contract. Source columns live IN the
    * data files (the transform-writer norm), so the partition schema
    * is empty and no column re-attachment happens. */
  final class TransformFileIndex(table: String,
      entries: Seq[DataFileEntry], spec: Seq[SpecField],
      dataSchema: org.apache.spark.sql.types.StructType,
      sizes: Map[String, Long])
      extends org.apache.spark.sql.execution.datasources.FileIndex {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.execution.datasources.PartitionDirectory

    @volatile var lastSelectedFileCount: Int = -1
    val totalFileCount: Int = entries.size

    override def rootPaths: Seq[Path] = Seq(new Path(table))
    override def partitionSchema: org.apache.spark.sql.types.StructType =
      new org.apache.spark.sql.types.StructType()
    override def listFiles(
        partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
        dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
        : Seq[PartitionDirectory] = {
      val preds = transformEntryPredicates(dataFilters, spec, dataSchema)
      val kept =
        if (preds.isEmpty) entries
        else entries.filter(e => preds.forall(_(e)))
      lastSelectedFileCount = kept.size
      val statuses = kept.map(e => new org.apache.hadoop.fs.FileStatus(
        sizes(e.path), false, 1, 128L * 1024 * 1024, 0L,
        new Path(e.path))).toArray
      Seq(PartitionDirectory(InternalRow.empty, statuses))
    }
    override def inputFiles: Array[String] = entries.map(_.path).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = sizes.values.sum
  }

  /** Indexed scan of a transform-partitioned snapshot: the returned
    * frame prunes pushed filters through [[TransformFileIndex]]; the
    * index is returned so tests assert the skip counts. Requires a
    * delete-free snapshot (MoR masks re-route through the masked
    * scan, unpruned — correctness first). */
  def readTransformIndexed(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): (DataFrame, TransformFileIndex) = {
    val entries = dataFileEntries(spark, table, snapshotId)
    require(entries.nonEmpty, s"snapshot has no data files: $table")
    val spec = partitionSpecFull(spark, table)
    // identity-only specs are served here too when the data files
    // carry the source columns (the Iceberg norm — [[readIndexed]]
    // routes them): identity is just the trivial transform
    require(spec.nonEmpty,
      s"$table has no partition spec — use readIndexed")
    require(positionDeleteFiles(spark, table, snapshotId).isEmpty &&
      equalityDeleteFiles(spark, table, snapshotId).isEmpty,
      s"$table carries row-level deletes — the masked scan serves it")
    val f = fs(spark, table)
    val dataSchema = spark.read.parquet(entries.head.path).schema
    val sizes = entries.map(e => e.path -> e.sizeBytes.getOrElse(
      f.getFileStatus(new Path(e.path)).getLen)).toMap
    val index = new TransformFileIndex(table, entries, spec, dataSchema, sizes)
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, index.partitionSchema, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty)(spark)
    (spark.baseRelationToDataFrame(rel), index)
  }

  /** TRANSFORM-AWARE pruned scan: plan-time file skipping for tables
    * partitioned by `days(ts)` / `bucket(N, id)` / `truncate(W, s)` —
    * the ecosystem-default Iceberg layouts ([[partitionSpecFull]]).
    * The predicate is resolved and constant-folded against the scan
    * (so literals arrive typed), its conjuncts are converted into
    * constraints on the manifest's partition-struct values via
    * [[IcebergTransforms.applyLiteral]], and only surviving files are
    * read. Equality/IN prune every transform; ranges prune the
    * order-preserving ones (never bucket). Unrecognized conjunct
    * shapes keep all files, and the FULL predicate is re-applied to
    * the surviving rows — pruning can only skip I/O, never change
    * results (the BloomIndex contract). Data files must carry the
    * source columns (true for [[IcebergExport.commitTransformSnapshot]]
    * and ecosystem writers; the Lake identity export reads through
    * [[readIndexed]]'s manifest-backed index instead). */
  def readPruned(spark: SparkSession, table: String,
      predicate: org.apache.spark.sql.Column,
      snapshotId: Option[Long] = None): PrunedScan = {
    import org.apache.spark.sql.catalyst.expressions._
    val entries = dataFileEntries(spark, table, snapshotId)
    require(entries.nonEmpty, s"snapshot has no data files: $table")
    val spec = partitionSpecFull(spark, table)
    val base = spark.read.parquet(entries.map(_.path): _*)
    val schema = base.schema
    // resolve + constant-fold the predicate against the real scan so
    // each conjunct carries typed Catalyst literals
    val optimized = base.filter(predicate).queryExecution.optimizedPlan
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val conds = optimized.collect {
      case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        conjuncts(fl.condition)
    }.flatten
    val preds = transformEntryPredicates(conds, spec, schema)
    val kept = entries.filter(e => preds.forall(_(e)))
    val posFiles = positionDeleteFiles(spark, table, snapshotId)
    val eqDels = equalityDeleteFiles(spark, table, snapshotId)
    val df =
      if (kept.isEmpty) base.filter(predicate).limit(0)
      else maskedScan(spark, kept, posFiles, eqDels)(es =>
        spark.read.parquet(es.map(_.path): _*)).filter(predicate)
    PrunedScan(df, kept.size, entries.size)
  }

  /** Transform-aware per-entry keep predicates from resolved
    * conjuncts — the shared core of [[readPruned]] (explicit API) and
    * [[TransformFileIndex]] (automatic plan-time pruning). Every
    * unrecognized shape contributes NO constraint: pruning can only
    * skip I/O, never drop rows (the BloomIndex contract — the full
    * predicate re-applies on the surviving scan either way). */
  private[sources] def transformEntryPredicates(
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      spec: Seq[SpecField],
      schema: org.apache.spark.sql.types.StructType): Seq[DataFileEntry => Boolean] = {
    import org.apache.spark.sql.catalyst.expressions._
    // transformed-literal normalization: Long-comparable, String, or
    // unsupported (no constraint — conservative)
    def norm(v: Any): Option[Either[Long, String]] = v match {
      case null => None
      case l: Long => Some(scala.util.Left(l))
      case i: Int => Some(scala.util.Left(i.toLong))
      case s: Short => Some(scala.util.Left(s.toLong))
      case b: Byte => Some(scala.util.Left(b.toLong))
      case s: String => Some(scala.util.Right(s))
      case _ => None
    }
    def transformed(fld: SpecField, dt: org.apache.spark.sql.types.DataType,
        v: Any): Option[Either[Long, String]] =
      try norm(IcebergTransforms.applyLiteral(fld.transform, dt, v))
      catch { case _: IllegalArgumentException => None }
    // identity partition values render as the COLUMN's string form —
    // integer/string sources compare directly; date/timestamp sources
    // compare through render-aware epoch parsing (see entryOrdinal)
    def comparable(fld: SpecField, dt: org.apache.spark.sql.types.DataType): Boolean =
      fld.transform.kind != "identity" || (dt match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.TimestampType => true
        case _ => false
      })
    def pval(e: DataFileEntry, fld: SpecField): Option[String] =
      e.partitionValues.get(fld.name)
    // Entry-value ordinal for a Long-comparable transformed literal:
    // plain digits first (ordinal renderings); identity date/timestamp
    // entries may instead render human-readable (`yyyy-MM-dd`,
    // ISO-micros) — parse those to the literal's epoch unit (days /
    // micros). None = unrecognized foreign rendering → keep the file.
    def entryOrdinal(dt: org.apache.spark.sql.types.DataType, kind: String)(
        s: String): Option[Long] =
      try Some(s.toLong) catch { case _: NumberFormatException =>
        if (kind != "identity") None
        else try dt match {
          case org.apache.spark.sql.types.DateType =>
            Some(java.time.LocalDate.parse(s).toEpochDay)
          case org.apache.spark.sql.types.TimestampType =>
            val iso = s.replace(' ', 'T').stripSuffix("Z")
            val ldt = java.time.LocalDateTime.parse(iso)
            Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000L)
          case _ => None
        } catch { case _: java.time.format.DateTimeParseException => None }
      }
    // code-point order = Spark's UTF-8 binary string ordering; JVM
    // String.compareTo is UTF-16 order, which disagrees past the BMP
    def cpCompare(a: String, b: String): Int = {
      val ai = a.codePoints().iterator(); val bi = b.codePoints().iterator()
      while (ai.hasNext && bi.hasNext) {
        val c = Integer.compare(ai.nextInt(), bi.nextInt())
        if (c != 0) return c
      }
      java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
    }
    def cmp(fld: SpecField, dt: org.apache.spark.sql.types.DataType)(
        s: String, t: Either[Long, String], op: Int): Boolean = t match {
      // op: 0 eq, -1 pval<=t, +1 pval>=t
      case scala.util.Left(l) =>
        entryOrdinal(dt, fld.transform.kind)(s) match {
          case Some(p) => if (op == 0) p == l else if (op < 0) p <= l else p >= l
          case None => true // foreign rendering: keep
        }
      case scala.util.Right(str) =>
        // monotonic string transforms (identity, truncate prefixes)
        // preserve code-point order, so ranges prune lexicographically
        if (op == 0) s == str
        else { val c = cpCompare(s, str); if (op < 0) c <= 0 else c >= 0 }
    }
    type EntryPred = DataFileEntry => Boolean
    def fieldsFor(src: String): Seq[SpecField] =
      spec.filter(f => f.sourceName.contains(src) &&
        schema.fields.exists(_.name == src) &&
        comparable(f, schema.fields.find(_.name == src).get.dataType))
    def dtOf(src: String) = schema.fields.find(_.name == src).get.dataType
    def eqPreds(src: String, v: Any): Seq[EntryPred] =
      fieldsFor(src).flatMap { fld =>
        transformed(fld, dtOf(src), v).map { t => (e: DataFileEntry) =>
          pval(e, fld).forall(cmp(fld, dtOf(src))(_, t, 0)) }
      }
    def rangePreds(src: String, v: Any, op: Int): Seq[EntryPred] =
      fieldsFor(src).filter(f => IcebergTransforms.isMonotonic(f.transform))
        .flatMap { fld =>
          transformed(fld, dtOf(src), v).map { t => (e: DataFileEntry) =>
            pval(e, fld).forall(cmp(fld, dtOf(src))(_, t, op)) }
        }
    conds.flatMap {
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null =>
        eqPreds(a.name, v)
      case EqualTo(Literal(v, _), a: AttributeReference) if v != null =>
        eqPreds(a.name, v)
      case In(a: AttributeReference, elems)
          if elems.nonEmpty && elems.forall {
            case Literal(v, _) => v != null; case _ => false } =>
        // a file survives if ANY element admits it, per spec field
        fieldsFor(a.name).flatMap { fld =>
          val ts = elems.collect { case Literal(v, _) =>
            transformed(fld, dtOf(a.name), v) }.flatten
          if (ts.size != elems.size) None
          else Some((e: DataFileEntry) =>
            pval(e, fld).forall(s => ts.exists(cmp(fld, dtOf(a.name))(s, _, 0))))
        }
      case GreaterThan(a: AttributeReference, Literal(v, _)) if v != null =>
        rangePreds(a.name, v, +1)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        rangePreds(a.name, v, +1)
      case LessThan(a: AttributeReference, Literal(v, _)) if v != null =>
        rangePreds(a.name, v, -1)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        rangePreds(a.name, v, -1)
      case GreaterThan(Literal(v, _), a: AttributeReference) if v != null =>
        rangePreds(a.name, v, -1) // v > a  =>  a < v
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if v != null =>
        rangePreds(a.name, v, -1)
      case LessThan(Literal(v, _), a: AttributeReference) if v != null =>
        rangePreds(a.name, v, +1)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) if v != null =>
        rangePreds(a.name, v, +1)
      case _ => Nil
    }
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

  /** Manifest-list entry: `content` distinguishes data (0/absent)
    * from delete (1) manifests, `sequence_number` orders commits for
    * equality-delete application — both format v2 fields; writers
    * that never emit deletes leave them null and readers default to
    * data / sequence 0. */
  private[sources] val manifestFileSchema: Schema = SchemaBuilder.record("manifest_file")
    .fields().requiredString("manifest_path").optionalInt("content")
    .optionalLong("sequence_number").endRecord()

  private[sources] def writeAvro(spark: SparkSession, path: String, schema: Schema,
      records: Seq[GenericRecord]): Unit = {
    val f = fs(spark, path)
    val out = f.create(new Path(path), true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
  }

  /** Commit a CDC upsert batch in the format v2 merge-on-read shape a
    * Flink/Iceberg upsert sink produces: the batch's rows land as a
    * NEW data file at the next sequence number, and the batch's KEY
    * VALUES land as an EQUALITY-DELETE file at the same sequence —
    * erasing any older image of each key, while the batch's own rows
    * survive because the spec applies an equality delete only to
    * sequences strictly BELOW its own. Optional `deleteKeys` rows are
    * tombstones: keys erased without replacement. The batch should be
    * key-distinct (duplicate keys in one batch both land). Prior
    * manifests carry forward verbatim at their recorded sequences.
    * Cost is O(batch) metadata + data per commit at any table size.
    * Returns the snapshot id. */
  def commitCdcBatch(upserts: DataFrame, table: String,
      keyCols: Seq[String],
      deleteKeys: Option[DataFrame] = None): Long = {
    val spark = upserts.sparkSession
    keyCols.foreach(k => require(upserts.columns.contains(k),
      s"upsert batch missing key column $k"))
    val f = fs(spark, table)
    f.mkdirs(new Path(s"$table/data"))
    f.mkdirs(new Path(s"$table/metadata"))
    val version = nextVersion(f, table)
    val seq = version
    def onefile(df: DataFrame, dest: String): (String, Long) = {
      val staging = s"$table/_staging_cdc_$version"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = f.listStatus(new Path(staging))
        .filter(_.getPath.getName.endsWith(".parquet")).head
      require(f.rename(part.getPath, new Path(dest)),
        s"failed to install $dest")
      // rename preserves length — carry the staging stat, no re-stat
      f.delete(new Path(staging), true); (dest, part.getLen)
    }
    val (dataPath, dataLen) = onefile(upserts, s"$table/data/cdc-$version.parquet")
    val delKeys = {
      val fromUpserts = upserts.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
      deleteKeys.fold(fromUpserts)(d =>
        fromUpserts.unionByName(d.select(
          keyCols.map(org.apache.spark.sql.functions.col): _*))).distinct()
    }
    val (delPath, delLen) = onefile(delKeys, s"$table/data/cdc-eqdel-$version.parquet")
    // rich v2 schemas: per-entry sequence numbers + data_file content
    val dfSchema = SchemaBuilder.record("data_file").fields()
      .requiredString("file_path").optionalInt("content")
      .optionalLong("file_size_in_bytes").endRecord()
    val entrySchema = SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status").optionalLong("sequence_number")
      .name("data_file").`type`(dfSchema).noDefault().endRecord()
    val listSchema = SchemaBuilder.record("manifest_file").fields()
      .requiredString("manifest_path").optionalInt("content")
      .optionalLong("sequence_number").endRecord()
    def entry(file: String, len: Long, content: Int) = {
      val d = new GenericData.Record(dfSchema)
      d.put("file_path", file); d.put("content", Int.box(content))
      d.put("file_size_in_bytes", Long.box(len))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("sequence_number", Long.box(seq))
      e.put("data_file", d); e
    }
    val mData = s"$table/metadata/cdc-m$version.avro"
    writeAvro(spark, mData, entrySchema, Seq(entry(dataPath, dataLen, 0)))
    val mDel = s"$table/metadata/cdc-dm$version.avro"
    writeAvro(spark, mDel, entrySchema, Seq(entry(delPath, delLen, 2)))
    // carry prior manifests verbatim at their recorded (content, seq)
    val prior: Seq[(String, Int, Long)] =
      if (version == 1) Nil else manifestsOf(spark, table, None)
    def listEntry(m: String, content: Int, s: Long) = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", m); r.put("content", Int.box(content))
      r.put("sequence_number", Long.box(s)); r
    }
    val listPath = s"$table/metadata/snap-cdc-$version.avro"
    writeAvro(spark, listPath, listSchema,
      prior.map(p => listEntry(p._1, p._2, p._3)) :+
        listEntry(mData, 0, seq) :+ listEntry(mDel, 1, seq))
    val mapper = new ObjectMapper()
    val priorSnaps = if (version == 1) "" else {
      val in = f.open(latestMetadata(spark, table))
      val meta = try mapper.readTree(in) finally in.close()
      val sb = new StringBuilder
      meta.get("snapshots").forEach(s =>
        sb.append(mapper.writeValueAsString(s)).append(','))
      sb.toString
    }
    val json = s"""{"format-version":2,"current-snapshot-id":$version,"snapshots":[$priorSnaps{"snapshot-id":$version,"manifest-list":${mapper.writeValueAsString(listPath)}}]}"""
    val out = f.create(new Path(f"$table/metadata/v$version%05d.metadata.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    version
  }

  /** Append a snapshot: the DataFrame's rows become data files listed
    * by a fresh manifest + manifest list + metadata.json version.
    * `carryForward` keeps previous snapshots' files live (append);
    * without it the new snapshot replaces the table (overwrite). */
  def commitSnapshot(df: DataFrame, table: String,
      carryForward: Boolean = true): Long = {
    val spark = df.sparkSession
    val f = fs(spark, table)
    val version = nextVersion(f, table)
    val snapId = version
    val staging = s"$table/_staging_v$version"
    df.write.mode("overwrite").parquet(staging)
    val parts = f.listStatus(new Path(staging))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val dataPaths = parts.zipWithIndex.map { case (st, i) =>
      val dest = s"$table/data/f$version-$i.parquet"
      f.mkdirs(new Path(s"$table/data"))
      require(f.rename(st.getPath, new Path(dest)),
        s"failed to install $dest")
      (dest, st.getLen) // rename preserves length — no re-stat
    }.toSeq
    f.delete(new Path(staging), true)
    // the new manifest lists ONLY this commit's files; carried state
    // rides the PRIOR manifest-list entries verbatim — flattening
    // prior data files into a fresh manifest would silently DROP any
    // delete manifests (and their sequence numbers) a CDC writer
    // (commitCdcBatch) produced, resurrecting deleted rows
    val priorManifests: Seq[(String, Int, Long)] =
      if (!carryForward) Nil
      else try manifestsOf(spark, table, None)
      catch { case _: Exception => Nil }
    val seq = priorManifests.map(_._3).foldLeft(0L)(math.max) + 1
    val entrySchema = manifestEntrySchemaFor(Nil)
    val entries = dataPaths.map { case (p, len) =>
      val dfRec = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      dfRec.put("file_path", p)
      dfRec.put("file_size_in_bytes", Long.box(len))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("data_file", dfRec); e
    }
    val manifestPath = s"$table/metadata/m$version.avro"
    writeAvro(spark, manifestPath, entrySchema, entries)
    def listEntry(m: String, content: Int, s: Long) = {
      val r = new GenericData.Record(manifestFileSchema)
      r.put("manifest_path", m); r.put("content", Int.box(content))
      r.put("sequence_number", Long.box(s)); r
    }
    val listPath = s"$table/metadata/snap-$snapId.avro"
    writeAvro(spark, listPath, manifestFileSchema,
      priorManifests.map(p => listEntry(p._1, p._2, p._3)) :+
        listEntry(manifestPath, 0, seq))
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
