package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** REAL-SPEC Iceberg format-v2 writer: emits the exact Avro manifest /
  * manifest-list schemas and full metadata.json shape the Apache
  * Iceberg Java implementation writes (spec:
  * iceberg.apache.org/spec — "Manifests" and "Manifest Lists" tables),
  * so [[IcebergRead]] is proven against the real on-disk contract, not
  * just this repo's simplified rendering (the same move
  * `manifest.flavor=paimon` made for [[PaimonRead]]; the reference
  * consumes these same files through its iceberg connector,
  * `fe/fe-core/.../connector/iceberg/IcebergMetadata.java`, and its
  * metadata scanner reads the identical field names —
  * `java-extensions/iceberg-metadata-reader/.../IcebergManifestsTableScanner.java:88`
  * `added_data_files_count` et al.).
  *
  * Fidelity points vs the simplified writer:
  *  - every Avro field carries its spec `field-id` (manifest_file
  *    500-519, manifest_entry 0-4, data_file 100-142, partition
  *    fields 1000+); optional fields are `["null", T]` unions;
  *  - `data_file` is the full v2 struct: content / file_path /
  *    file_format / typed `r102` partition record (date values as
  *    `{"type":"int","logicalType":"date"}` day ordinals) /
  *    record_count / file_size_in_bytes / split_offsets / bounds maps
  *    in the avro key-value (`k126_v127`, logicalType map) rendering;
  *  - the manifest list carries all 15 v2 `manifest_file` fields
  *    including min/sequence numbers, add/exist/delete counts and the
  *    `r508` partition-summary array with typed bound bytes
  *    (single-value serialization, little-endian);
  *  - file-level Avro metadata (`schema`, `partition-spec`,
  *    `partition-spec-id`, `format-version`, `content`) matches the
  *    Java writer's keys;
  *  - metadata.json is the full v2 document: table-uuid, location,
  *    last-sequence-number, schemas (with field ids), partition-specs,
  *    sort-orders, refs, snapshot summaries, snapshot-log,
  *    metadata-log, plus HadoopCatalog's `version-hint.text`.
  *
  * Data files keep EVERY source column (the Iceberg norm — partition
  * values are derivable metadata, not storage), unlike the Lake
  * export's re-attached layout; [[IcebergRead.readIndexed]] detects
  * that and prunes through the transform index instead of
  * re-attaching. Scale: one `partitionBy` staging write (shuffle-free)
  * + O(files) driver metadata per commit. */
object IcebergReal {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def icebergType(dt: DataType): String = dt match {
    case LongType => "long"
    case IntegerType | ShortType | ByteType => "int"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case _ => "string"
  }

  /** Avro type JSON for a partition-struct field of the given source
    * type — the typed rendering real manifests carry. */
  private def avroPartitionType(dt: DataType): String = dt match {
    case LongType => "\"long\""
    case IntegerType | ShortType | ByteType => "\"int\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case BooleanType => "\"boolean\""
    case _ => "\"string\""
  }

  /** The typed Avro value for a partition dir-name string; null for
    * the hive null-partition sentinel. */
  private def partitionValue(dt: DataType, s: String): AnyRef =
    if (s == null || s == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case null => s
      case LongType => java.lang.Long.valueOf(s)
      case IntegerType | ShortType | ByteType => Integer.valueOf(s)
      case DateType => Integer.valueOf(java.time.LocalDate.parse(s)
        .toEpochDay.toInt)
      case DoubleType => java.lang.Double.valueOf(s)
      case FloatType => java.lang.Float.valueOf(s)
      case BooleanType => java.lang.Boolean.valueOf(s)
      case _ => s
    }

  /** Natural ordering of a typed partition value — bounds must sort by
    * VALUE, not by toString (lexicographic "10" < "9" would invert
    * numeric and date bounds and mislead a pruning reader). */
  private def boundOrder(v: AnyRef): (Double, String) = v match {
    case n: java.lang.Number => (n.doubleValue(), "")
    case b: java.lang.Boolean => (if (b) 1.0 else 0.0, "")
    case s => (0.0, s.toString)
  }

  /** Single-value serialization (spec Appendix D) of a partition bound
    * for the field summaries: little-endian fixed width for numerics /
    * date, UTF-8 for strings. */
  private def boundBytes(dt: DataType, v: AnyRef): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    v match {
      case i: Integer => bb.putInt(i); java.util.Arrays.copyOf(bb.array(), 4)
      case l: java.lang.Long => bb.putLong(l); bb.array()
      case d: java.lang.Double => bb.putDouble(d); bb.array()
      case f: java.lang.Float => bb.putFloat(f); java.util.Arrays.copyOf(bb.array(), 4)
      case b: java.lang.Boolean => Array[Byte](if (b) 1 else 0)
      case s => s.toString.getBytes("UTF-8")
    }
  }

  private def kvMapSchema(name: String, kId: Int, vId: Int,
      vType: String): String =
    s"""["null",{"type":"array","items":{"type":"record","name":"$name","fields":[
       {"name":"key","type":"int","field-id":$kId},
       {"name":"value","type":"$vType","field-id":$vId}]},
       "logicalType":"map"}]"""

  /** The v2 `manifest_entry` Avro schema for a table partitioned by
    * the given (name, sourceType) identity fields. */
  private[sources] def manifestEntrySchema(
      partition: Seq[(String, DataType)]): Schema = {
    val pFields = partition.zipWithIndex.map { case ((n, dt), i) =>
      s"""{"name":"$n","type":["null",${avroPartitionType(dt)}],"default":null,"field-id":${1000 + i}}"""
    }.mkString(",")
    new Schema.Parser().parse(s"""
      {"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int","field-id":0},
        {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          {"name":"content","type":"int","field-id":134},
          {"name":"file_path","type":"string","field-id":100},
          {"name":"file_format","type":"string","field-id":101},
          {"name":"partition","type":{"type":"record","name":"r102","fields":[$pFields]},"field-id":102},
          {"name":"record_count","type":"long","field-id":103},
          {"name":"file_size_in_bytes","type":"long","field-id":104},
          {"name":"column_sizes","type":${kvMapSchema("k117_v118", 117, 118, "long")},"default":null,"field-id":108},
          {"name":"value_counts","type":${kvMapSchema("k119_v120", 119, 120, "long")},"default":null,"field-id":109},
          {"name":"null_value_counts","type":${kvMapSchema("k121_v122", 121, 122, "long")},"default":null,"field-id":110},
          {"name":"nan_value_counts","type":${kvMapSchema("k138_v139", 138, 139, "long")},"default":null,"field-id":137},
          {"name":"lower_bounds","type":${kvMapSchema("k126_v127", 126, 127, "bytes")},"default":null,"field-id":125},
          {"name":"upper_bounds","type":${kvMapSchema("k129_v130", 129, 130, "bytes")},"default":null,"field-id":128},
          {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
          {"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132},
          {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
          {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140}
        ]},"field-id":2}
      ]}""")
  }

  /** The v2 `manifest_file` (manifest-list entry) Avro schema. */
  private[sources] val manifestFileSchema: Schema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_data_files_count","type":"int","field-id":504},
      {"name":"existing_data_files_count","type":"int","field-id":505},
      {"name":"deleted_data_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","type":["null",{"type":"array","items":{"type":"record","name":"r508","fields":[
        {"name":"contains_null","type":"boolean","field-id":509},
        {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
        {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
        {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
      ]},"element-id":508}],"default":null,"field-id":507},
      {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":519}
    ]}""")

  private def writeAvro(spark: SparkSession, path: String, schema: Schema,
      meta: Seq[(String, String)], records: Seq[GenericRecord]): Long = {
    val f = fs(spark, path)
    val out = f.create(new Path(path), true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
    f.getFileStatus(new Path(path)).getLen
  }

  private def footerRowCount(spark: SparkSession, path: String): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(path), spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Footer row counts for a commit's files in ONE bounded-pool pass —
    * each footer open is an independent metadata round-trip, and the
    * commit paths used to read them serially per file (minutes of
    * driver wall at 100k-file commits on an object store; same shape
    * as Lake.listCommitFiles). */
  private def footerRowCounts(spark: SparkSession, paths: Seq[String]): Map[String, Long] = {
    if (paths.isEmpty) return Map.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, paths.size))
    try {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[(String, Long)]] =
        paths.map(p => (() => p -> footerRowCount(spark, p)): java.util.concurrent.Callable[(String, Long)])
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
    } finally pool.shutdown()
  }

  /** Iceberg schema JSON (the `schemas` entry / manifest `schema`
    * metadata) with field ids 1..n in dataframe order. */
  private def schemaJson(schema: StructType): String = {
    val mapper = new ObjectMapper()
    val fields = schema.fields.zipWithIndex.map { case (fl, i) =>
      s"""{"id":${i + 1},"name":${mapper.writeValueAsString(fl.name)},"required":false,"type":"${icebergType(fl.dataType)}"}"""
    }.mkString(",")
    s"""{"type":"struct","schema-id":0,"fields":[$fields]}"""
  }

  /** APPEND a DataFrame as one real-spec v2 snapshot; identity
    * partitioning on `partitionCols` (source columns STAY in the data
    * files). Returns the snapshot id (= sequence number = metadata
    * version). */
  def commitAppend(df: DataFrame, table: String,
      partitionCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    partitionCols.foreach(c => require(df.columns.contains(c),
      s"unknown partition column $c"))
    val v = IcebergRead.nextVersion(f, table)
    val snapId = v
    val seq = v
    val nowMs = System.currentTimeMillis()
    f.mkdirs(new Path(s"$table/data"))
    f.mkdirs(new Path(s"$table/metadata"))
    val pTypes: Seq[(String, DataType)] =
      partitionCols.map(c => c -> df.schema(c).dataType)

    // ---- data files: partitionBy on COPIES so sources stay in files
    val ptAlias = partitionCols.zipWithIndex.map { case (c, i) => s"__pt$i" }
    val staged = partitionCols.zip(ptAlias).foldLeft(df) {
      case (d, (c, a)) => d.withColumn(a, col(c))
    }
    val staging = s"$table/_staging_real$v"
    if (ptAlias.isEmpty) staged.write.mode("overwrite").parquet(staging)
    else staged.write.partitionBy(ptAlias: _*).mode("overwrite")
      .parquet(staging)
    // move each part file under data/, capturing its partition values
    val found = scala.collection.mutable.ArrayBuffer[(String, Seq[String], Long)]()
    def walk(p: Path, vals: List[String]): Unit =
      f.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.contains("="))
          walk(st.getPath, vals :+ PathNames.unescapePathName(
            name.substring(name.indexOf('=') + 1)))
        else if (st.isFile && name.endsWith(".parquet")) {
          // re-ESCAPE when rebuilding the destination dir — `vals` are
          // unescaped for the typed manifest partition record, but a
          // raw '/', '=', or ':' in a string value would break the
          // path or diverge from the Hive dir a reader reconstructs
          val sub = if (vals.isEmpty) "" else
            partitionCols.zip(vals).map { case (c, x) =>
              s"$c=${PathNames.escapePathName(x)}" }
              .mkString("", "/", "/")
          val dest = s"$table/data/$sub${java.util.UUID.randomUUID()}.parquet"
          f.mkdirs(new Path(dest).getParent)
          require(f.rename(st.getPath, new Path(dest)),
            s"failed to install data file $dest")
          found += ((dest, vals, st.getLen)) // rename preserves length — no re-stat
        }
      }
    walk(new Path(staging), Nil)
    f.delete(new Path(staging), true)
    require(found.nonEmpty, "append produced no data files")

    // ---- manifest avro
    val entrySchema = manifestEntrySchema(pTypes)
    val dfSchema = entrySchema.getField("data_file").schema()
    val pSchema = dfSchema.getField("partition").schema()
    val sj = schemaJson(df.schema)
    val specFieldsJson = pTypes.zipWithIndex.map { case ((c, _), i) =>
      val srcId = df.schema.fieldNames.indexOf(c) + 1
      s"""{"name":${mapper.writeValueAsString(c)},"transform":"identity","source-id":$srcId,"field-id":${1000 + i}}"""
    }.mkString(",")
    var totalRows = 0L
    val rowCounts = footerRowCounts(spark, found.map(_._1).toSeq)
    val entries = found.map { case (path, vals, size) =>
      val p = new GenericData.Record(pSchema)
      pTypes.zip(vals).foreach { case ((c, dt), s) =>
        p.put(c, partitionValue(dt, s)) }
      val rc = rowCounts(path)
      totalRows += rc
      val d = new GenericData.Record(dfSchema)
      d.put("content", Int.box(0))
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", p)
      d.put("record_count", Long.box(rc))
      d.put("file_size_in_bytes", Long.box(size))
      val splits = new java.util.ArrayList[java.lang.Long]()
      splits.add(4L)
      d.put("split_offsets", splits)
      val e = new GenericData.Record(entrySchema)
      e.put("status", Int.box(1)) // ADDED
      e.put("snapshot_id", Long.box(snapId))
      e.put("sequence_number", Long.box(seq))
      e.put("file_sequence_number", Long.box(seq))
      e.put("data_file", d)
      e: GenericRecord
    }.toSeq
    val manifestPath =
      s"$table/metadata/${java.util.UUID.randomUUID()}-m0.avro"
    val manifestLen = writeAvro(spark, manifestPath, entrySchema, Seq(
      "schema" -> sj,
      "partition-spec" -> s"[$specFieldsJson]",
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "data"), entries)

    // ---- manifest list: new manifest + carried-forward priors
    val prior: Seq[GenericRecord] =
      if (v == 1) Nil
      else {
        val prevList = currentManifestList(spark, table)
        IcebergRead.readAvroRecords(spark, prevList)
      }
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", manifestPath)
    mf.put("manifest_length", Long.box(manifestLen))
    mf.put("partition_spec_id", Int.box(0))
    mf.put("content", Int.box(0))
    mf.put("sequence_number", Long.box(seq))
    mf.put("min_sequence_number", Long.box(seq))
    mf.put("added_snapshot_id", Long.box(snapId))
    mf.put("added_data_files_count", Int.box(found.size))
    mf.put("existing_data_files_count", Int.box(0))
    mf.put("deleted_data_files_count", Int.box(0))
    mf.put("added_rows_count", Long.box(totalRows))
    mf.put("existing_rows_count", Long.box(0L))
    mf.put("deleted_rows_count", Long.box(0L))
    if (pTypes.nonEmpty) {
      val sumSchema = manifestFileSchema.getField("partitions").schema()
        .getTypes.get(1).getElementType
      val sums = new java.util.ArrayList[GenericRecord]()
      pTypes.zipWithIndex.foreach { case ((c, dt), i) =>
        val typed = found.map(x => partitionValue(dt, x._2(i)))
        val r = new GenericData.Record(sumSchema)
        r.put("contains_null",
          java.lang.Boolean.valueOf(typed.exists(_ == null)))
        r.put("contains_nan", java.lang.Boolean.FALSE)
        val present = typed.filter(_ != null)
        if (present.nonEmpty) {
          val ordered = present.sortBy(boundOrder)
          r.put("lower_bound",
            java.nio.ByteBuffer.wrap(boundBytes(dt, ordered.head)))
          r.put("upper_bound",
            java.nio.ByteBuffer.wrap(boundBytes(dt, ordered.last)))
        }
        sums.add(r)
      }
      mf.put("partitions", sums)
    }
    val listPath =
      s"$table/metadata/snap-$snapId-1-${java.util.UUID.randomUUID()}.avro"
    writeAvro(spark, listPath, manifestFileSchema, Seq(
      "format-version" -> "2",
      "snapshot-id" -> snapId.toString,
      "sequence-number" -> seq.toString,
      "parent-snapshot-id" -> (if (v == 1) "null" else (v - 1).toString)),
      (mf: GenericRecord) +: prior)

    // ---- metadata.json (full v2 document) + version hint
    val ps = priorState(spark, table, v)
    val summary = s"""{"operation":"append","added-data-files":"${found.size}","added-records":"$totalRows","total-records":"${ps.totalRecords + totalRows}","total-position-deletes":"${ps.totalPosDeletes}","total-equality-deletes":"${ps.totalEqDeletes}"}"""
    writeMetadata(spark, table, v, nowMs, ps, summary, listPath,
      sj, specFieldsJson, df.schema.size, 999 + pTypes.size)
    snapId
  }

  /** Prior-metadata state a new commit must CARRY FORWARD to stay
    * spec-faithful (a real reader time-travels via snapshot-log,
    * audits via metadata-log, and trusts the summary's cumulative
    * totals): prior snapshots / snapshot-log / metadata-log entries
    * as raw JSON (trailing commas included), the cumulative
    * total-records / total-position-deletes from the current
    * snapshot's summary, and the prior schemas/spec document pieces
    * for commits that change neither. */
  private final case class PriorState(snapshotsJson: String,
      snapshotLogJson: String, metadataLogJson: String,
      totalRecords: Long, totalPosDeletes: Long, totalEqDeletes: Long,
      schemasJson: String, specsJson: String,
      lastColumnId: Int, lastPartitionId: Int)

  private def priorState(spark: SparkSession, table: String,
      v: Long): PriorState =
    if (v == 1) PriorState("", "", "", 0L, 0L, 0L, "", "", 0, 999)
    else {
      val f = fs(spark, table)
      val path = IcebergRead.latestMetadata(spark, table)
      val in = f.open(path)
      val node = try new ObjectMapper().readTree(in) finally in.close()
      def joined(field: String): String = {
        val sb = new StringBuilder
        Option(node.get(field)).foreach(_.forEach(s =>
          sb.append(s.toString).append(",")))
        sb.toString
      }
      // the PREVIOUS metadata file becomes a metadata-log entry
      // (spec: "previous metadata file locations"), appended after
      // any entries it already carried — rendered under the caller's
      // table location (like every other path in the document), not
      // the filesystem-qualified form, so a relocated table's log
      // stays resolvable alongside its manifests
      val mlb = new StringBuilder(joined("metadata-log"))
      mlb.append(s"""{"timestamp-ms":${node.get("last-updated-ms").asLong},"metadata-file":${new ObjectMapper().writeValueAsString(s"$table/metadata/${path.getName}")}},""")
      val cur = node.get("current-snapshot-id").asLong
      var total = 0L; var posD = 0L; var eqD = 0L
      node.get("snapshots").forEach { s =>
        if (s.get("snapshot-id").asLong == cur) {
          val sum = s.get("summary")
          total = Option(sum.get("total-records"))
            .map(_.asText.toLong).getOrElse(0L)
          posD = Option(sum.get("total-position-deletes"))
            .map(_.asText.toLong).getOrElse(0L)
          eqD = Option(sum.get("total-equality-deletes"))
            .map(_.asText.toLong).getOrElse(0L)
        }
      }
      def stripArr(field: String): String = {
        val sb = new StringBuilder
        Option(node.get(field)).foreach(_.forEach(s =>
          sb.append(s.toString).append(",")))
        sb.toString.stripSuffix(",")
      }
      PriorState(joined("snapshots"), joined("snapshot-log"),
        mlb.toString, total, posD, eqD,
        stripArr("schemas"), stripArr("partition-specs"),
        Option(node.get("last-column-id")).map(_.asInt).getOrElse(0),
        Option(node.get("last-partition-id")).map(_.asInt).getOrElse(999))
    }

  /** Write `v<N>.metadata.json` + `version-hint.text` with every
    * carried-forward section populated: snapshots, snapshot-log (all
    * prior entries + this snapshot), metadata-log (prior entries +
    * the previous metadata file). */
  private def writeMetadata(spark: SparkSession, table: String, v: Long,
      nowMs: Long, ps: PriorState, summaryJson: String, listPath: String,
      schemaJson: String, specFieldsJson: String, lastColumnId: Int,
      lastPartitionId: Int): Unit = {
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    val snapId = v; val seq = v
    val uuid = java.util.UUID.nameUUIDFromBytes(table.getBytes("UTF-8"))
    val json =
      s"""{"format-version":2,"table-uuid":"$uuid","location":${mapper.writeValueAsString(table)},
         |"last-sequence-number":$seq,"last-updated-ms":$nowMs,"last-column-id":$lastColumnId,
         |"current-schema-id":0,"schemas":[$schemaJson],
         |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[$specFieldsJson]}],
         |"last-partition-id":$lastPartitionId,
         |"default-sort-order-id":0,"sort-orders":[{"order-id":0,"fields":[]}],
         |"properties":{"write.format.default":"parquet"},
         |"current-snapshot-id":$snapId,
         |"refs":{"main":{"snapshot-id":$snapId,"type":"branch"}},
         |"snapshots":[${ps.snapshotsJson}{"sequence-number":$seq,"snapshot-id":$snapId,"timestamp-ms":$nowMs,"summary":$summaryJson,"manifest-list":${mapper.writeValueAsString(listPath)},"schema-id":0}],
         |"snapshot-log":[${ps.snapshotLogJson}{"timestamp-ms":$nowMs,"snapshot-id":$snapId}],
         |"metadata-log":[${ps.metadataLogJson.stripSuffix(",")}]}""".stripMargin.replace("\n", "")
    val out = f.create(new Path(s"$table/metadata/v$v.metadata.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val hint = f.create(new Path(s"$table/metadata/version-hint.text"), true)
    try hint.write(v.toString.getBytes("UTF-8")) finally hint.close()
  }

  /** MERGE-ON-READ delete: one real-spec v2 snapshot marking every row
    * matching `predicate` deleted via POSITION DELETE files — parquet
    * files of (`file_path`, `pos`) rows carrying the spec's reserved
    * parquet field-ids (2147483546 / 2147483545), sorted by
    * (file_path, pos), one file per touched partition (written in ONE
    * distributed staging job), listed by a `content=1` DELETE manifest
    * whose entries are the full v2 `data_file` struct with
    * `content=1` (POSITION_DELETES) and typed partition records, and a
    * manifest-list entry with `content=1` and this commit's sequence
    * number — the spec's scoping: position deletes apply to data files
    * with a data sequence number ≤ the delete's (path-targeted rows
    * make that implicit for THIS writer's UUID paths, but the numbers
    * are real so a foreign reader scopes correctly). Prior manifests
    * (data and delete) carry forward verbatim; later appends carry
    * this delete manifest forward the same way. Reference consumes
    * such tables via its iceberg connector
    * (`fe/fe-core/.../connector/iceberg/IcebergMetadata.java`).
    * Returns the snapshot id. */
  def commitPositionDeletes(spark: SparkSession, table: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val f = fs(spark, table)
    val v = IcebergRead.nextVersion(f, table)
    val snapId = v
    val seq = v
    val nowMs = System.currentTimeMillis()
    val entries = IcebergRead.dataFileEntries(spark, table, None)
    require(entries.nonEmpty, s"$table has no data files")
    val dataSchema = spark.read.parquet(entries.head.path).schema
    val specNames = IcebergRead.partitionSpecFields(spark, table).map(_._1)
    val pTypes: Seq[(String, DataType)] =
      specNames.map(n => n -> dataSchema(n).dataType)
    // rendered-path → (manifest path, partition sub-dir) translation,
    // driver-bounded by #files
    def subOf(p: String): String = {
      val marker = "/data/"
      val i = p.lastIndexOf(marker)
      val rel = p.substring(i + marker.length)
      val j = rel.lastIndexOf('/')
      if (j < 0) "" else rel.substring(0, j + 1)
    }
    import spark.implicits._
    val trans = entries.map(e =>
      (IcebergRead.metaRendering(spark, e.path), e.path, subOf(e.path)))
      .toDF("__if", "__raw", "__sub")
    val scan = spark.read.parquet(entries.map(_.path): _*)
      .withColumn("__if", col("_metadata.file_path"))
      .withColumn("__ip", col("_metadata.row_index"))
    // the spec's reserved field-ids ride the parquet schema
    val fpMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", 2147483546L).build()
    val posMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", 2147483545L).build()
    val doomed = scan.filter(predicate)
      .join(broadcast(trans), Seq("__if"))
      .select(col("__raw").as("file_path", fpMeta),
        col("__ip").as("pos", posMeta), col("__sub"))
    val staging = s"$table/_staging_del$v"
    val sorted = doomed.repartition(col("__sub"))
      .sortWithinPartitions("file_path", "pos")
    if (specNames.isEmpty)
      sorted.drop("__sub").write.mode("overwrite").parquet(staging)
    else sorted.write.partitionBy("__sub").mode("overwrite").parquet(staging)
    val found = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    def walk(p: Path, sub: String): Unit =
      f.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.startsWith("__sub="))
          walk(st.getPath, PathNames.unescapePathName(
            name.substring("__sub=".length)))
        else if (st.isFile && name.endsWith(".parquet")) {
          val dest =
            s"$table/data/$sub${java.util.UUID.randomUUID()}-deletes.parquet"
          f.mkdirs(new Path(dest).getParent)
          require(f.rename(st.getPath, new Path(dest)),
            s"failed to install delete file $dest")
          found += ((dest, sub, st.getLen)) // rename preserves length — no re-stat
        }
      }
    walk(new Path(staging), "")
    f.delete(new Path(staging), true)
    require(found.nonEmpty, s"$table: delete predicate matched no rows")

    // ---- delete manifest (content=1 list entry, content=1 data_file)
    val entrySchema = manifestEntrySchema(pTypes)
    val dfSchema = entrySchema.getField("data_file").schema()
    val pSchema = dfSchema.getField("partition").schema()
    def valsOf(sub: String): Seq[String] =
      sub.split('/').filter(_.nonEmpty).toSeq.map(s =>
        PathNames.unescapePathName(s.substring(s.indexOf('=') + 1)))
    var delRows = 0L
    val rowCounts = footerRowCounts(spark, found.map(_._1).toSeq)
    val delEntries = found.map { case (path, sub, size) =>
      val p = new GenericData.Record(pSchema)
      pTypes.zip(valsOf(sub)).foreach { case ((c, dt), s) =>
        p.put(c, partitionValue(dt, s)) }
      val rc = rowCounts(path)
      delRows += rc
      val d = new GenericData.Record(dfSchema)
      d.put("content", Int.box(1)) // POSITION_DELETES
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", p)
      d.put("record_count", Long.box(rc))
      d.put("file_size_in_bytes", Long.box(size))
      val e = new GenericData.Record(entrySchema)
      e.put("status", Int.box(1)) // ADDED
      e.put("snapshot_id", Long.box(snapId))
      e.put("sequence_number", Long.box(seq))
      e.put("file_sequence_number", Long.box(seq))
      e.put("data_file", d)
      e: GenericRecord
    }.toSeq
    val mapper = new ObjectMapper()
    val sj = schemaJson(
      StructType(dataSchema.fields.map(_.copy(nullable = true))))
    val specFieldsJson = pTypes.zipWithIndex.map { case ((c, _), i) =>
      val srcId = dataSchema.fieldNames.indexOf(c) + 1
      s"""{"name":${mapper.writeValueAsString(c)},"transform":"identity","source-id":$srcId,"field-id":${1000 + i}}"""
    }.mkString(",")
    val manifestPath =
      s"$table/metadata/${java.util.UUID.randomUUID()}-m0.avro"
    val manifestLen = writeAvro(spark, manifestPath, entrySchema, Seq(
      "schema" -> sj,
      "partition-spec" -> s"[$specFieldsJson]",
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "deletes"), delEntries)

    // ---- manifest list: the delete manifest + carried-forward priors
    val prior = IcebergRead.readAvroRecords(spark,
      currentManifestList(spark, table))
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", manifestPath)
    mf.put("manifest_length", Long.box(manifestLen))
    mf.put("partition_spec_id", Int.box(0))
    mf.put("content", Int.box(1)) // DELETES
    mf.put("sequence_number", Long.box(seq))
    mf.put("min_sequence_number", Long.box(seq))
    mf.put("added_snapshot_id", Long.box(snapId))
    mf.put("added_data_files_count", Int.box(found.size))
    mf.put("existing_data_files_count", Int.box(0))
    mf.put("deleted_data_files_count", Int.box(0))
    mf.put("added_rows_count", Long.box(delRows))
    mf.put("existing_rows_count", Long.box(0L))
    mf.put("deleted_rows_count", Long.box(0L))
    if (pTypes.nonEmpty) {
      val sumSchema = manifestFileSchema.getField("partitions").schema()
        .getTypes.get(1).getElementType
      val sums = new java.util.ArrayList[GenericRecord]()
      pTypes.zipWithIndex.foreach { case ((c, dt), i) =>
        val typed = found.map(x => partitionValue(dt, valsOf(x._2)(i)))
        val r = new GenericData.Record(sumSchema)
        r.put("contains_null",
          java.lang.Boolean.valueOf(typed.exists(_ == null)))
        r.put("contains_nan", java.lang.Boolean.FALSE)
        val present = typed.filter(_ != null)
        if (present.nonEmpty) {
          val ordered = present.sortBy(boundOrder)
          r.put("lower_bound",
            java.nio.ByteBuffer.wrap(boundBytes(dt, ordered.head)))
          r.put("upper_bound",
            java.nio.ByteBuffer.wrap(boundBytes(dt, ordered.last)))
        }
        sums.add(r)
      }
      mf.put("partitions", sums)
    }
    val listPath =
      s"$table/metadata/snap-$snapId-1-${java.util.UUID.randomUUID()}.avro"
    writeAvro(spark, listPath, manifestFileSchema, Seq(
      "format-version" -> "2",
      "snapshot-id" -> snapId.toString,
      "sequence-number" -> seq.toString,
      "parent-snapshot-id" -> (v - 1).toString),
      (mf: GenericRecord) +: prior)

    // ---- metadata.json: total-records is the DATA-file total (the
    // Java writer's semantic — position deletes accrue in
    // total-position-deletes, they do not shrink total-records)
    val ps = priorState(spark, table, v)
    val summary = s"""{"operation":"delete","added-delete-files":"${found.size}","added-position-deletes":"$delRows","total-records":"${ps.totalRecords}","total-position-deletes":"${ps.totalPosDeletes + delRows}","total-equality-deletes":"${ps.totalEqDeletes}"}"""
    writeMetadata(spark, table, v, nowMs, ps, summary, listPath,
      sj, specFieldsJson, dataSchema.size, 999 + pTypes.size)
    snapId
  }

  /** MERGE-ON-READ equality delete (the Flink-CDC encoding): one
    * real-spec v2 snapshot whose `content=1` DELETE manifest lists
    * EQUALITY-delete files — parquet files containing EXACTLY the
    * equality columns (each carrying its TABLE-SCHEMA field-id in the
    * parquet footer, the spec's binding between delete rows and data
    * columns), `data_file.content = 2` (EQUALITY_DELETES) and
    * `equality_ids` naming those field-ids. The spec's scoping is
    * STRICT: an equality delete applies to data files with a data
    * sequence number strictly BELOW the delete's, so a CDC upsert's
    * re-inserted row (sequenced at or above) survives its own delete —
    * [[IcebergRead.maskEqualityDeletes]] implements exactly that
    * residual. Partitioned tables require the equality columns to
    * include the partition columns (the delete files then land
    * partition-scoped like the data, one staging job); global deletes
    * under a second unpartitioned spec are out of scope. Returns the
    * snapshot id. */
  def commitEqualityDeletes(spark: SparkSession, table: String,
      keys: DataFrame, equalityCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, table)
    val v = IcebergRead.nextVersion(f, table)
    val snapId = v
    val seq = v
    val nowMs = System.currentTimeMillis()
    val entries = IcebergRead.dataFileEntries(spark, table, None)
    require(entries.nonEmpty, s"$table has no data files")
    val dataSchema = spark.read.parquet(entries.head.path).schema
    val specNames = IcebergRead.partitionSpecFields(spark, table).map(_._1)
    val pTypes: Seq[(String, DataType)] =
      specNames.map(n => n -> dataSchema(n).dataType)
    require(equalityCols.nonEmpty, "equality delete without key columns")
    equalityCols.foreach(c => require(
      dataSchema.fieldNames.contains(c) && keys.columns.contains(c),
      s"equality column $c missing from table or batch"))
    specNames.foreach(p => require(equalityCols.contains(p),
      s"partitioned equality deletes must include partition column $p " +
        "in the equality key (global unpartitioned-spec deletes are " +
        "not supported)"))
    val fieldIdOf: Map[String, Int] =
      dataSchema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    // delete rows: exactly the equality columns, table field-ids in
    // the parquet footer, typed as the table schema
    val typedCols = equalityCols.map { c =>
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", fieldIdOf(c).toLong).build()
      col(c).cast(dataSchema(c).dataType).as(c, meta)
    }
    val ptAlias = specNames.zipWithIndex.map { case (_, i) => s"__pt$i" }
    val staged0 = keys.select(typedCols: _*)
    val staged = specNames.zip(ptAlias).foldLeft(staged0) {
      case (d, (c, a)) => d.withColumn(a, col(c))
    }
    val staging = s"$table/_staging_eq$v"
    if (ptAlias.isEmpty) staged.write.mode("overwrite").parquet(staging)
    else staged.write.partitionBy(ptAlias: _*).mode("overwrite")
      .parquet(staging)
    val found = scala.collection.mutable.ArrayBuffer[(String, Seq[String], Long)]()
    def walk(p: Path, vals: List[String]): Unit =
      f.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.contains("="))
          walk(st.getPath, vals :+ PathNames.unescapePathName(
            name.substring(name.indexOf('=') + 1)))
        else if (st.isFile && name.endsWith(".parquet")) {
          val sub = if (vals.isEmpty) "" else
            specNames.zip(vals).map { case (c, x) =>
              s"$c=${PathNames.escapePathName(x)}" }.mkString("", "/", "/")
          val dest =
            s"$table/data/$sub${java.util.UUID.randomUUID()}-eq-deletes.parquet"
          f.mkdirs(new Path(dest).getParent)
          require(f.rename(st.getPath, new Path(dest)),
            s"failed to install delete file $dest")
          found += ((dest, vals, st.getLen)) // rename preserves length — no re-stat
        }
      }
    walk(new Path(staging), Nil)
    f.delete(new Path(staging), true)
    require(found.nonEmpty, s"$table: equality-delete batch is empty")

    // ---- delete manifest (content=1 list entry, content=2 data_file)
    val entrySchema = manifestEntrySchema(pTypes)
    val dfSchema = entrySchema.getField("data_file").schema()
    val pSchema = dfSchema.getField("partition").schema()
    var delRows = 0L
    val rowCounts = footerRowCounts(spark, found.map(_._1).toSeq)
    val delEntries = found.map { case (path, vals, size) =>
      val p = new GenericData.Record(pSchema)
      pTypes.zip(vals).foreach { case ((c, dt), s) =>
        p.put(c, partitionValue(dt, s)) }
      val rc = rowCounts(path)
      delRows += rc
      val d = new GenericData.Record(dfSchema)
      d.put("content", Int.box(2)) // EQUALITY_DELETES
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", p)
      d.put("record_count", Long.box(rc))
      d.put("file_size_in_bytes", Long.box(size))
      val ids = new java.util.ArrayList[Integer]()
      equalityCols.foreach(c => ids.add(Int.box(fieldIdOf(c))))
      d.put("equality_ids", ids)
      val e = new GenericData.Record(entrySchema)
      e.put("status", Int.box(1)) // ADDED
      e.put("snapshot_id", Long.box(snapId))
      e.put("sequence_number", Long.box(seq))
      e.put("file_sequence_number", Long.box(seq))
      e.put("data_file", d)
      e: GenericRecord
    }.toSeq
    val mapper = new ObjectMapper()
    val sj = schemaJson(
      StructType(dataSchema.fields.map(_.copy(nullable = true))))
    val specFieldsJson = pTypes.zipWithIndex.map { case ((c, _), i) =>
      s"""{"name":${mapper.writeValueAsString(c)},"transform":"identity","source-id":${fieldIdOf(c)},"field-id":${1000 + i}}"""
    }.mkString(",")
    val manifestPath =
      s"$table/metadata/${java.util.UUID.randomUUID()}-m0.avro"
    val manifestLen = writeAvro(spark, manifestPath, entrySchema, Seq(
      "schema" -> sj,
      "partition-spec" -> s"[$specFieldsJson]",
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> "deletes"), delEntries)

    // ---- manifest list: the delete manifest + carried-forward priors
    val prior = IcebergRead.readAvroRecords(spark,
      currentManifestList(spark, table))
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", manifestPath)
    mf.put("manifest_length", Long.box(manifestLen))
    mf.put("partition_spec_id", Int.box(0))
    mf.put("content", Int.box(1)) // DELETES
    mf.put("sequence_number", Long.box(seq))
    mf.put("min_sequence_number", Long.box(seq))
    mf.put("added_snapshot_id", Long.box(snapId))
    mf.put("added_data_files_count", Int.box(found.size))
    mf.put("existing_data_files_count", Int.box(0))
    mf.put("deleted_data_files_count", Int.box(0))
    mf.put("added_rows_count", Long.box(delRows))
    mf.put("existing_rows_count", Long.box(0L))
    mf.put("deleted_rows_count", Long.box(0L))
    if (pTypes.nonEmpty) {
      val sumSchema = manifestFileSchema.getField("partitions").schema()
        .getTypes.get(1).getElementType
      val sums = new java.util.ArrayList[GenericRecord]()
      pTypes.zipWithIndex.foreach { case ((c, dt), i) =>
        val typed = found.map(x => partitionValue(dt, x._2(i)))
        val r = new GenericData.Record(sumSchema)
        r.put("contains_null",
          java.lang.Boolean.valueOf(typed.exists(_ == null)))
        r.put("contains_nan", java.lang.Boolean.FALSE)
        val present = typed.filter(_ != null)
        if (present.nonEmpty) {
          val ordered = present.sortBy(boundOrder)
          r.put("lower_bound",
            java.nio.ByteBuffer.wrap(boundBytes(dt, ordered.head)))
          r.put("upper_bound",
            java.nio.ByteBuffer.wrap(boundBytes(dt, ordered.last)))
        }
        sums.add(r)
      }
      mf.put("partitions", sums)
    }
    val listPath =
      s"$table/metadata/snap-$snapId-1-${java.util.UUID.randomUUID()}.avro"
    writeAvro(spark, listPath, manifestFileSchema, Seq(
      "format-version" -> "2",
      "snapshot-id" -> snapId.toString,
      "sequence-number" -> seq.toString,
      "parent-snapshot-id" -> (v - 1).toString),
      (mf: GenericRecord) +: prior)

    val ps = priorState(spark, table, v)
    val summary = s"""{"operation":"delete","added-delete-files":"${found.size}","added-equality-deletes":"$delRows","total-records":"${ps.totalRecords}","total-position-deletes":"${ps.totalPosDeletes}","total-equality-deletes":"${ps.totalEqDeletes + delRows}"}"""
    writeMetadata(spark, table, v, nowMs, ps, summary, listPath,
      sj, specFieldsJson, dataSchema.size, 999 + pTypes.size)
    snapId
  }

  private def currentManifestList(spark: SparkSession,
      table: String): String = {
    val node = readMetaNode(spark, table)
    val cur = node.get("current-snapshot-id").asLong
    var list: String = null
    node.get("snapshots").forEach(s =>
      if (s.get("snapshot-id").asLong == cur)
        list = s.get("manifest-list").asText())
    require(list != null, s"current snapshot $cur not in metadata")
    list
  }

  private def readMetaNode(spark: SparkSession, table: String) = {
    val f = fs(spark, table)
    val in = f.open(IcebergRead.latestMetadata(spark, table))
    try new ObjectMapper().readTree(in) finally in.close()
  }
}
