package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader for the OPEN Delta Lake transaction-log protocol
  * (delta.io/protocol — `_delta_log/<version>.json`, one JSON action
  * per line: add / remove / metaData / protocol / commitInfo). The
  * reference ships a delta-lake external-table connector
  * (`fe/fe-core/.../connector/delta/`, ConnectorType DELTALAKE); this
  * is the Spark-native equivalent built directly on the public log
  * format, no delta-spark jar required: replay the actions up to the
  * requested version, reconstruct the live file set, scan those
  * parquet files.
  *
  * Scale shape: the log is KBs of JSON read ONCE on the driver (the
  * same listing work Delta's own reader does); the data scan is a
  * plain pruned parquet read over exactly the live files — pushdown,
  * column pruning and AQE all apply as usual. Checkpoint parquet
  * files (protocol optimization for 10k+ commit logs) are not needed
  * at this log size and are documented out of scope.
  */
object DeltaRead {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Commit versions present in the log, ascending. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val logDir = new Path(s"$table/_delta_log")
    val f = fs(spark, table)
    if (!f.exists(logDir)) throw new IllegalArgumentException(
      s"not a delta table (no _delta_log): $table")
    // strictly <version>.json — V2 checkpoint manifests are ALSO .json
    // (`<v>.checkpoint.<uuid>.json`) and must not parse as commits
    f.listStatus(logDir).map(_.getPath.getName).collect {
      case n if n.endsWith(".json") &&
        n.stripSuffix(".json").forall(_.isDigit) =>
        n.stripSuffix(".json").toLong
    }.sorted.toSeq
  }

  /** Delta `path` fields are URL-encoded (percent-escaped) relative
    * paths — or absolute URIs for shallow-cloned files — per the
    * protocol; decode BEFORE set membership so an encoded add and its
    * remove cancel, and before scan-path construction so files with
    * spaces/special chars resolve. Malformed escapes fall back to the
    * raw string (our own writer never encodes). */
  private def decodePath(raw: String): String =
    try {
      val u = new java.net.URI(raw)
      if (u.getScheme != null) u.toString // absolute URI: keep scheme, decode later at read
      else Option(u.getPath).getOrElse(raw)
    } catch { case _: java.net.URISyntaxException => raw }

  /** Checkpoint versions present in the log (protocol: every N
    * commits, a `<version>.checkpoint.parquet` snapshot of the live
    * action set lets readers skip the JSON replay — and is the ONLY
    * entry point once old JSON commits are cleaned). */
  def checkpointVersions(spark: SparkSession, table: String): Seq[Long] =
    checkpointsByVersion(spark, table).keys.toSeq.sorted

  private val ClassicCkpt = "(\\d{20})\\.checkpoint\\.parquet".r
  private val MultiPartCkpt = "(\\d{20})\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet".r
  private val V2Ckpt = "(\\d{20})\\.checkpoint\\.[0-9a-zA-Z-]+\\.(json|parquet)".r

  /** Checkpoint FILES per version — all three published namings:
    * classic single-file `<v>.checkpoint.parquet`, multi-part
    * `<v>.checkpoint.<i>.<n>.parquet`, and V2 UUID-named
    * `<v>.checkpoint.<uuid>.{json,parquet}` (PROTOCOL.md §V2 Spec —
    * the manifest carries `sidecar` actions pointing into
    * `_delta_log/_sidecars/`). */
  private def checkpointsByVersion(spark: SparkSession,
      table: String): Map[Long, Seq[String]] = {
    val logDir = new Path(s"$table/_delta_log")
    val f = fs(spark, table)
    if (!f.exists(logDir)) return Map.empty
    f.listStatus(logDir).map(_.getPath.getName).collect {
      case n @ ClassicCkpt(v) => v.toLong -> n
      case n @ MultiPartCkpt(v) => v.toLong -> n
      case n @ V2Ckpt(v, _) => v.toLong -> n
    }.toSeq.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sorted }
  }

  /** A live add after replay: decoded path, partition values, the
    * size/modificationTime the log recorded for it (0 when an old log
    * omitted them) — carried so checkpoints can store the real stats
    * instead of placeholders — and the deletion-vector descriptor
    * when the writer attached one (a re-add of the same path replaces
    * the previous descriptor, the protocol's DV-upgrade shape). */
  private case class LiveAdd(path: String, pvals: Map[String, String],
      size: Long, modTime: Long, dv: Option[DeltaDv.Descriptor] = None,
      stats: Option[String] = None)

  /** One JSON `add` action into the live map — shared by commit-tail
    * replay and V2 json checkpoint manifests. */
  private def ingestAddNode(add: com.fasterxml.jackson.databind.JsonNode,
      live: scala.collection.mutable.LinkedHashMap[String, LiveAdd]): Unit = {
    val pvals = scala.collection.mutable.Map[String, String]()
    if (add.has("partitionValues"))
      add.get("partitionValues").fields().forEachRemaining(e =>
        if (!e.getValue.isNull) pvals(e.getKey) = e.getValue.asText())
    val p = decodePath(add.get("path").asText())
    val dv = if (!add.has("deletionVector") ||
        add.get("deletionVector").isNull) None
      else {
        val d = add.get("deletionVector")
        Some(DeltaDv.Descriptor(
          d.get("storageType").asText(),
          d.get("pathOrInlineDv").asText(),
          if (d.has("offset") && !d.get("offset").isNull)
            d.get("offset").asInt() else 0,
          d.get("sizeInBytes").asInt(),
          d.get("cardinality").asLong()))
      }
    live(p) = LiveAdd(p, pvals.toMap,
      if (add.has("size")) add.get("size").asLong(0L) else 0L,
      if (add.has("modificationTime")) add.get("modificationTime").asLong(0L) else 0L,
      dv,
      if (add.has("stats") && !add.get("stats").isNull)
        Some(add.get("stats").asText()) else None)
  }

  /** One replay pass: (live adds, partition columns, schema json or
    * null). Starts from the newest checkpoint at or below
    * `versionAsOf` when one exists (required once old JSON commits
    * are vacuumed), then replays the JSON tail. */
  private def replay(spark: SparkSession, table: String,
      versionAsOf: Option[Long]): (Seq[LiveAdd], Seq[String], String) = {
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    val jsonVersions = versions(spark, table)
    val upTo = versionAsOf.getOrElse(
      (jsonVersions ++ checkpointVersions(spark, table)).max)
    val live = scala.collection.mutable.LinkedHashMap[String, LiveAdd]()
    var partCols: Seq[String] = Nil
    var schemaJson: String = null

    // ---- shared action ingestion (checkpoint parquet rows / json
    // lines / sidecar rows all funnel through these) ------------------
    def ingestParquetRows(rows: org.apache.spark.sql.DataFrame): Unit = {
      val cols = rows.columns.toSet
      if (cols.contains("metaData")) {
        rows.select("metaData").filter("metaData is not null").collect().foreach { r =>
          val md = r.getStruct(0)
          val names = md.schema.fieldNames
          if (names.contains("schemaString")) schemaJson = md.getAs[String]("schemaString")
          if (names.contains("partitionColumns"))
            // parquet hands back a MUTABLE ArraySeq; assigning it to a
            // 2.13 `Seq` (= immutable.Seq) checkcasts and throws
            partCols = Option(md.getAs[scala.collection.Seq[String]](
              "partitionColumns")).map(_.toList).getOrElse(Nil)
        }
      }
      if (cols.contains("add")) {
        // deletion-vector descriptors ride in the add struct per
        // PROTOCOL.md §Checkpoints — parse them so a checkpoint of a
        // DV-live version replays losslessly (DESCRIPTOR fields only;
        // the roaring sidecar bytes stay where pathOrInlineDv points)
        val addSchema = rows.schema("add").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val withDv = addSchema.fieldNames.contains("deletionVector")
        val withStats = addSchema.fieldNames.contains("stats")
        val sel = Seq("add.path", "add.partitionValues", "add.size",
          "add.modificationTime") ++
          (if (withDv) Seq("add.deletionVector") else Nil) ++
          (if (withStats) Seq("add.stats") else Nil)
        val statsIdx = if (withDv) 5 else 4
        rows.select(sel.head, sel.tail: _*)
          .filter("add is not null and add.path is not null").collect().foreach { r =>
            val pvals = Option(r.getAs[Map[String, String]](1)).getOrElse(Map.empty)
              .filter(_._2 != null)
            val p = decodePath(r.getString(0))
            val dv = if (!withDv || r.isNullAt(4)) None else {
              val d = r.getStruct(4)
              Some(DeltaDv.Descriptor(
                d.getAs[String]("storageType"),
                d.getAs[String]("pathOrInlineDv"),
                if (d.isNullAt(d.fieldIndex("offset"))) 0
                else d.getAs[Int]("offset"),
                d.getAs[Int]("sizeInBytes"),
                d.getAs[Long]("cardinality")))
            }
            val stats = if (!withStats || r.isNullAt(statsIdx)) None
              else Some(r.getString(statsIdx))
            live(p) = LiveAdd(p, pvals,
              if (r.isNullAt(2)) 0L else r.getLong(2),
              if (r.isNullAt(3)) 0L else r.getLong(3),
              dv, stats)
          }
      }
    }
    def sidecarNames(rows: org.apache.spark.sql.DataFrame): Seq[String] =
      if (!rows.columns.contains("sidecar")) Nil
      else rows.select("sidecar.path")
        .filter("sidecar is not null and sidecar.path is not null")
        .collect().map(_.getString(0)).toSeq

    // V2 checkpoints (PROTOCOL.md §V2 Spec): the UUID-named manifest
    // (json or parquet) carries metaData/protocol + `sidecar` actions;
    // the add actions live in `_delta_log/_sidecars/` parquet. A
    // checkpoint's remove actions are vacuum tombstones — not replayed.
    val ckptFiles = checkpointsByVersion(spark, table)
    val ckpt = ckptFiles.keys.filter(_ <= upTo).toSeq.sorted.lastOption
    ckpt.foreach { cv =>
      val names = ckptFiles(cv)
      val (jsonNames, parqNames) = names.partition(_.endsWith(".json"))
      val sidecars = scala.collection.mutable.ArrayBuffer[String]()
      jsonNames.foreach { n =>
        val in = f.open(new Path(s"$table/_delta_log/$n"))
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        text.linesIterator.filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("metaData")) {
            val md = node.get("metaData")
            if (md.has("schemaString")) schemaJson = md.get("schemaString").asText()
            if (md.has("partitionColumns")) {
              val b = scala.collection.mutable.ArrayBuffer[String]()
              md.get("partitionColumns").forEach(c => b += c.asText())
              partCols = b.toSeq
            }
          }
          if (node.has("add")) ingestAddNode(node.get("add"), live)
          if (node.has("sidecar") && node.get("sidecar").has("path"))
            sidecars += node.get("sidecar").get("path").asText()
        }
      }
      if (parqNames.nonEmpty) {
        val rows = spark.read.parquet(
          parqNames.map(n => s"$table/_delta_log/$n"): _*)
        ingestParquetRows(rows)
        sidecars ++= sidecarNames(rows)
      }
      if (sidecars.nonEmpty)
        ingestParquetRows(spark.read.parquet(
          sidecars.toSeq.map(n => s"$table/_delta_log/_sidecars/$n"): _*))
    }
    val replayFrom = ckpt.map(_ + 1).getOrElse(0L)
    val missing = (replayFrom to upTo).filterNot(v =>
      jsonVersions.contains(v))
    require(missing.isEmpty,
      s"cannot reconstruct $table@v$upTo: commits ${missing.mkString(",")} " +
      "are cleaned and no checkpoint covers them")
    jsonVersions.filter(v => v >= replayFrom && v <= upTo).foreach { v =>
      val p = new Path(f"$table/_delta_log/$v%020d.json")
      val in = f.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.linesIterator.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("metaData")) {
          val md = node.get("metaData")
          if (md.has("schemaString")) schemaJson = md.get("schemaString").asText()
          if (md.has("partitionColumns")) {
            val b = scala.collection.mutable.ArrayBuffer[String]()
            md.get("partitionColumns").forEach(c => b += c.asText())
            partCols = b.toSeq
          }
        }
        if (node.has("add")) ingestAddNode(node.get("add"), live)
        if (node.has("remove")) live -= decodePath(node.get("remove").get("path").asText())
      }
    }
    (live.values.toSeq, partCols, schemaJson)
  }

  /** Live data files after replaying the log through `versionAsOf`
    * (defaults to the latest commit). */
  def liveFiles(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): Seq[String] =
    replay(spark, table, versionAsOf)._1.map(_.path)

  /** The snapshot's LIVE FILE inventory as a DataFrame — the metadata
    * surface a planner plans from: decoded path, one string column per
    * partition column, the recorded file size, and `num_records`
    * parsed from the add's stats JSON (null when the writer recorded
    * none). This is the layer the FOREIGN Delta fixture gate pins: a
    * real Delta-Lake 3.1.0 `_delta_log` (classic checkpoint parquet +
    * JSON commit tail) that ships no data parquets, so checkpoint
    * bootstrap + tail replay are proven against real-engine bytes. */
  def inventory(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.{col, get_json_object}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val (adds, partCols, _) = replay(spark, table, versionAsOf)
    val schema = StructType(
      (StructField("path", StringType) +:
        partCols.map(pc => StructField(pc, StringType))) ++
        Seq(StructField("size", LongType),
          StructField("stats", StringType, nullable = true)))
    val rows = adds.map(a => Row.fromSeq(
      (a.path +: partCols.map(pc => a.pvals.get(pc).orNull)) ++
        Seq(a.size, a.stats.orNull)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .withColumn("num_records",
        get_json_object(col("stats"), "$.numRecords").cast("long"))
      .drop("stats")
  }

  /** Scan the table at a version — a plain parquet read over the live
    * file set, so pushdown/pruning behave exactly as on native data.
    * Partition columns come from the LOG (each add's partitionValues,
    * typed by metaData.schemaString), per the protocol — never from
    * directory-layout inference, which breaks on layouts like a Lake
    * export's data/commit-N/p=x/… (files at the same depth under
    * different non-kv parents).
    *
    * Column mapping (`delta.columnMapping.mode = name`, how real
    * writers implement RENAME/DROP COLUMN without rewrites): when a
    * schema field carries `delta.columnMapping.physicalName` in its
    * metadata, the data files (and a partitioned add's
    * partitionValues keys) use that PHYSICAL name — the scan renames
    * physical → logical at the read boundary and projects the
    * logical schema, so mapped and unmapped tables read identically. */
  def read(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val (adds, partCols, schemaJson) = replay(spark, table, versionAsOf)
    if (adds.isEmpty)
      throw new IllegalArgumentException(s"no live files at $table v$versionAsOf")
    def abs(p: String) = p.startsWith("/") || p.contains(":/")
    def resolve(p: String) = if (abs(p)) p else s"$table/$p"
    import org.apache.spark.sql.functions.{col, lit}
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val physOf: Map[String, String] = schema.fields.flatMap { f =>
      if (f.metadata.contains("delta.columnMapping.physicalName"))
        Some(f.name -> f.metadata.getString("delta.columnMapping.physicalName"))
      else None
    }.toMap
    // one projection, not sequential renames: a pair of RENAMEs can
    // SWAP two names (logical 'a' ↔ physical 'b'), where rename-by-
    // rename would collide; the select binds every logical field to
    // its physical source simultaneously and drops since-dropped
    // fields' physical columns
    def unmap(df: DataFrame): DataFrame =
      if (physOf.isEmpty) df
      else df.select(schema.fields.toIndexedSeq.flatMap { fd =>
        val phys = physOf.getOrElse(fd.name, fd.name)
        if (df.columns.contains(phys)) Some(df(phys).as(fd.name)) else None
      }: _*)
    // deletion vectors: resolve each descriptor's row indexes
    // driver-side (cardinality is load-batch-scale by the MoR
    // contract), split the scan into clean/dirty files, and broadcast
    // anti-join the dirty subset on (_metadata.file_path, row_index)
    // — the Lake/Iceberg masking shape
    def maskDv(df: DataFrame, group: Seq[LiveAdd]): DataFrame = {
      import spark.implicits._
      val dirty = group.filter(a => a.dv.exists(_.cardinality > 0))
      if (dirty.isEmpty) return df
      val pairs = dirty.flatMap { a =>
        val meta = IcebergRead.metaRendering(spark, resolve(a.path))
        DeltaDv.resolve(spark, table, a.dv.get).map(pos => (meta, pos))
      }.toDF("__df", "__dp")
      df.withColumn("__df", col("_metadata.file_path"))
        .withColumn("__dp", col("_metadata.row_index"))
        .join(org.apache.spark.sql.functions.broadcast(pairs),
          Seq("__df", "__dp"), "left_anti")
        .drop("__df", "__dp")
    }
    def scanWithDv(group: Seq[LiveAdd]): DataFrame = {
      val (dirty, clean) = group.partition(_.dv.exists(_.cardinality > 0))
      val cleanDf = if (clean.isEmpty) None
        else Some(unmap(spark.read.parquet(clean.map(a => resolve(a.path)): _*)))
      val dirtyDf = if (dirty.isEmpty) None
        else Some(unmap(maskDv(
          spark.read.parquet(dirty.map(a => resolve(a.path)): _*), dirty)))
      (cleanDf, dirtyDf) match {
        case (Some(c), Some(d)) => c.unionByName(d)
        case (Some(c), None) => c
        case (None, Some(d)) => d
        case (None, None) => unmap(spark.read.parquet(group.map(a => resolve(a.path)): _*))
      }
    }
    if (partCols.isEmpty)
      scanWithDv(adds)
    else {
      // one pruned parquet read per distinct partition tuple; the
      // tuple's literals attach typed by the log schema (mapped
      // tables key partitionValues by the physical name)
      adds.groupBy(_.pvals).map { case (pvals, group) =>
        val base = scanWithDv(group)
        partCols.foldLeft(base) { (df, c) =>
          val dt = schema.fields.find(_.name == c).map(_.dataType)
            .getOrElse(org.apache.spark.sql.types.StringType)
          val v = pvals.getOrElse(c,
            pvals.getOrElse(physOf.getOrElse(c, c), null))
          df.withColumn(c, lit(v).cast(dt))
        }
      }.reduce(_ unionByName _)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  /** Row-level change feed between two Delta versions — the
    * table_changes / CDF shape, derived from the log actions alone:
    * per commit, fresh `add`s (minus their own deletion-vector mask)
    * emit as `insert`; true `remove`s (path gone from the live set)
    * emit their previously-visible rows as `delete`; a DV-UPGRADED
    * re-add (remove+add of the same path with a wider vector — the
    * shape [[DeltaExport]] writes for merge-on-read commits) emits
    * only the NEWLY-masked positions as `delete`. Retraction model:
    * an update is delete(old) + insert(new); consumers fold by key.
    * Cost is O(changed rows + dirty files) per commit — nothing
    * table-sized. Columns: the table's plus `__change_type` and
    * `__commit_version` (the [[Lake.changes]] contract, so consumers
    * are interchangeable) — including PARTITION columns (attached as
    * typed literals from each add's partitionValues; data files don't
    * store them) and with column-mapped tables unmapped physical →
    * logical through the same projection [[read]] uses. */
  def changes(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    import spark.implicits._
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    val known = versions(spark, table)
    require(fromVersion >= 0 && toVersion > fromVersion &&
      known.contains(toVersion),
      s"bad change range v$fromVersion..v$toVersion")
    def abs(p: String) = p.startsWith("/") || p.contains(":/")
    def resolve(p: String) = if (abs(p)) p else s"$table/$p"
    def dvPositions(d: Option[DeltaDv.Descriptor]): Array[Long] =
      d.filter(_.cardinality > 0)
        .map(DeltaDv.resolve(spark, table, _)).getOrElse(Array.emptyLongArray)
    // rows of `path` restricted to / excluding a position set
    def rowsAt(path: String, positions: Array[Long], keep: Boolean): DataFrame = {
      val df = spark.read.parquet(resolve(path))
        .withColumn("__dp", col("_metadata.row_index"))
      val pairs = positions.toSeq.toDF("__dp")
      val joined =
        if (keep) df.join(broadcast(pairs), Seq("__dp"), "left_semi")
        else df.join(broadcast(pairs), Seq("__dp"), "left_anti")
      joined.drop("__dp")
    }
    val steps = ((fromVersion + 1) to toVersion).flatMap { v =>
      require(known.contains(v),
        s"commit $v of $table is cleaned — cannot derive changes")
      // adds/removes of THIS commit only (pvals kept — data files
      // don't store partition columns, the emitted rows must)
      val adds = scala.collection.mutable.LinkedHashMap[
        String, (Option[DeltaDv.Descriptor], Map[String, String])]()
      val removes = scala.collection.mutable.LinkedHashSet[String]()
      val in = f.open(new Path(f"$table/_delta_log/$v%020d.json"))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      text.linesIterator.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        if (node.has("add")) {
          val add = node.get("add")
          val dv = if (!add.has("deletionVector") ||
              add.get("deletionVector").isNull) None
            else {
              val d = add.get("deletionVector")
              Some(DeltaDv.Descriptor(d.get("storageType").asText(),
                d.get("pathOrInlineDv").asText(),
                if (d.has("offset") && !d.get("offset").isNull)
                  d.get("offset").asInt() else 0,
                d.get("sizeInBytes").asInt(), d.get("cardinality").asLong()))
            }
          val pvals = scala.collection.mutable.Map[String, String]()
          if (add.has("partitionValues"))
            add.get("partitionValues").fields().forEachRemaining(e =>
              if (!e.getValue.isNull) pvals(e.getKey) = e.getValue.asText())
          adds(decodePath(add.get("path").asText())) = (dv, pvals.toMap)
        }
        if (node.has("remove"))
          removes += decodePath(node.get("remove").get("path").asText())
      }
      if (adds.isEmpty && removes.isEmpty) None
      else {
        // schema AT THIS COMMIT drives the unmap projection and the
        // partition-literal types — the read()-path contract
        val (_, partCols, schemaJson) = replay(spark, table, Some(v))
        val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val physOf: Map[String, String] = schema.fields.flatMap { f =>
          if (f.metadata.contains("delta.columnMapping.physicalName"))
            Some(f.name -> f.metadata.getString("delta.columnMapping.physicalName"))
          else None
        }.toMap
        // physical → logical rename + partition-literal attach, then
        // project to the logical fields the frame can serve (union
        // across steps fills evolution gaps by name)
        def finish(df: DataFrame, pvals: Map[String, String]): DataFrame = {
          val unmapped =
            if (physOf.isEmpty) df
            else df.select(schema.fields.toIndexedSeq.flatMap { fd =>
              val phys = physOf.getOrElse(fd.name, fd.name)
              if (df.columns.contains(phys)) Some(df(phys).as(fd.name)) else None
            }: _*)
          val withParts = partCols.foldLeft(unmapped) { (d, c) =>
            val dt = schema.fields.find(_.name == c).map(_.dataType)
              .getOrElse(org.apache.spark.sql.types.StringType)
            val pv = pvals.getOrElse(c,
              pvals.getOrElse(physOf.getOrElse(c, c), null))
            d.withColumn(c, lit(pv).cast(dt))
          }
          withParts.select(schema.fieldNames.toIndexedSeq
            .filter(withParts.columns.contains).map(col): _*)
        }
        // prior live state resolves which removes are upgrades
        val (prevAdds, _, _) = replay(spark, table, Some(v - 1))
        val prevByPath = prevAdds.map(a => a.path -> a).toMap
        val upgraded = adds.keySet.filter(prevByPath.contains)
        val fresh = adds.keySet.filterNot(prevByPath.contains)
        val dropped = removes.filterNot(adds.contains)
          .filter(prevByPath.contains)
        val ins = fresh.toSeq.map { p =>
          val masked = dvPositions(adds(p)._1)
          finish(
            if (masked.isEmpty) spark.read.parquet(resolve(p))
            else rowsAt(p, masked, keep = false), adds(p)._2)
        }.map(_.withColumn("__change_type", lit("insert")))
        val delFull = dropped.toSeq.map { p =>
          val prevMask = dvPositions(prevByPath(p).dv)
          finish(
            if (prevMask.isEmpty) spark.read.parquet(resolve(p))
            else rowsAt(p, prevMask, keep = false), prevByPath(p).pvals)
            .withColumn("__change_type", lit("delete"))
        }
        val delUpgraded = upgraded.toSeq.flatMap { p =>
          val before = dvPositions(prevByPath(p).dv).toSet
          val newly = dvPositions(adds(p)._1).filterNot(before)
          if (newly.isEmpty) None
          else Some(finish(rowsAt(p, newly, keep = true), prevByPath(p).pvals)
            .withColumn("__change_type", lit("delete")))
        }
        (ins ++ delFull ++ delUpgraded)
          .reduceOption(_.unionByName(_, allowMissingColumns = true))
          .map(_.withColumn("__commit_version", lit(v)))
      }
    }
    require(steps.nonEmpty || known.exists(v =>
      v > fromVersion && v <= toVersion), s"no commits in range")
    steps.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse {
        // quiet window: empty frame with the table's change schema
        read(spark, table, Some(toVersion))
          .withColumn("__change_type", lit("insert"))
          .withColumn("__commit_version", lit(toVersion))
          .filter(lit(false))
      }
  }

  /** Change feed via the WRITER-side change-data files (delta.io
    * PROTOCOL.md §Change Data Files): a commit carrying `cdc` actions
    * serves its changes from those `_change_data/` parquet files —
    * the spec's reader rule: when any cdc action is present, it is
    * authoritative for the commit and add/remove actions are ignored
    * for change purposes (an empty cdc set ⇒ a rewrite with no
    * logical change). Commits WITHOUT cdc actions fall back to the
    * action-derived [[changes]] for that one-version window, so a log
    * with mixed CDF and plain commits reads end to end. Emits the
    * [[graft.sources.Lake.changes]] contract columns
    * (`__change_type`, `__commit_version`). */
  def changesCdf(spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val f = fs(spark, table)
    val mapper = new ObjectMapper()
    val known = versions(spark, table)
    require(fromVersion >= 0 && toVersion > fromVersion &&
      known.contains(toVersion),
      s"bad change range v$fromVersion..v$toVersion")
    def abs(p: String) = p.startsWith("/") || p.contains(":/")
    def resolve(p: String) = if (abs(p)) p else s"$table/$p"
    val steps = ((fromVersion + 1) to toVersion).flatMap { v =>
      require(known.contains(v),
        s"commit $v of $table is cleaned — cannot derive changes")
      val in = f.open(new Path(f"$table/_delta_log/$v%020d.json"))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // per cdc action: (path, partitionValues) — per the protocol,
      // change files don't store partition columns in-file; they come
      // from the action, attached as typed literals (the read() shape)
      val cdcActions = text.linesIterator.filter(_.nonEmpty).flatMap { line =>
        val node = mapper.readTree(line)
        if (node.has("cdc")) {
          val c = node.get("cdc")
          val pv = scala.collection.mutable.LinkedHashMap[String, String]()
          if (c.has("partitionValues"))
            c.get("partitionValues").fields().forEachRemaining(e =>
              pv += e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText()))
          Some((decodePath(c.get("path").asText()), pv.toMap))
        } else None
      }.toSeq
      if (cdcActions.isEmpty) {
        // no cdc action: the action-derived feed covers this commit
        val one = changes(spark, table, v - 1, v)
        if (one.isEmpty) None else Some(one)
      } else {
        val (_, partCols, schemaJson) = replay(spark, table, Some(v))
        val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val physOf: Map[String, String] = schema.fields.flatMap { fd =>
          if (fd.metadata.contains("delta.columnMapping.physicalName"))
            Some(fd.name -> fd.metadata.getString("delta.columnMapping.physicalName"))
          else None
        }.toMap
        // one pruned read per distinct partition tuple; columns the
        // file already embeds win (pre-partitionValues exports)
        val rows = cdcActions.groupBy(_._2).map { case (pvals, group) =>
          val base = spark.read.parquet(group.map(g => resolve(g._1)): _*)
          partCols.filterNot(base.columns.contains).foldLeft(base) { (df, c) =>
            val dt = schema.fields.find(_.name == c).map(_.dataType)
              .getOrElse(org.apache.spark.sql.types.StringType)
            val pv = pvals.getOrElse(c,
              pvals.getOrElse(physOf.getOrElse(c, c), null))
            df.withColumn(c, lit(pv).cast(dt))
          }
        }.reduce(_.unionByName(_, allowMissingColumns = true))
        if (rows.isEmpty) None
        else Some(rows
          .withColumnRenamed("_change_type", "__change_type")
          // foreign writers (Spark+Delta) emit updates as
          // update_preimage/update_postimage pairs; under this feed's
          // retraction contract those ARE delete(old)/insert(new)
          .withColumn("__change_type",
            when(col("__change_type") === "update_preimage", lit("delete"))
              .when(col("__change_type") === "update_postimage", lit("insert"))
              .otherwise(col("__change_type")))
          .withColumn("__commit_version", lit(v)))
      }
    }
    steps.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(
        read(spark, table, Some(toVersion))
          .withColumn("__change_type", lit("insert"))
          .withColumn("__commit_version", lit(toVersion))
          .filter(lit(false)))
  }

  /** Write a protocol checkpoint at `version` (default: latest): one
    * parquet snapshot of the live action set (add rows + metaData +
    * protocol) plus the `_last_checkpoint` pointer. After this, JSON
    * commits ≤ version are no longer needed to reconstruct the table
    * — the reader enters at the checkpoint and replays only the tail,
    * which is how real Delta tables survive log cleanup. */
  private lazy val dvT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
  }
  // add actions carry their deletionVector descriptor per
  // PROTOCOL.md §Checkpoints — a DV-live version checkpoints
  // losslessly (pre-r9 this refused; a reader bootstrapping a
  // DV-bearing export had to replay the full JSON log)
  private lazy val addT = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", dvT)))
  }

  def writeCheckpoint(spark: SparkSession, table: String,
      version: Option[Long] = None): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val v = version.getOrElse(versions(spark, table).last)
    val (adds, partCols, schemaJson) = replay(spark, table, Some(v))
    val mdT = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))
    val hasDv = adds.exists(_.dv.exists(_.cardinality > 0))
    val protoT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType),
      StructField("readerFeatures", ArrayType(StringType)),
      StructField("writerFeatures", ArrayType(StringType))))
    val schema = StructType(Seq(
      StructField("add", addT), StructField("metaData", mdT),
      StructField("protocol", protoT)))
    // paths go back in percent-ENCODED form — the same form the JSON
    // log stores — so replay's single decodePath pass is correct for
    // both sources and external Delta readers see spec-conformant
    // paths; absolute URIs (shallow clones) are kept verbatim, as in
    // the log. size/modificationTime carry the replayed real values.
    def reencode(p: String): String =
      if (p.contains(":/")) p else DeltaExport.encodePath(p)
    def dvRow(a: LiveAdd): Row = a.dv.filter(_.cardinality > 0).map(d =>
      Row(d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes,
        d.cardinality)).orNull
    val protoRow =
      if (hasDv) Row(3, 7, Seq("deletionVectors"), Seq("deletionVectors"))
      else Row(1, 2, null, null)
    val rows: Seq[Row] =
      Seq(Row(null, Row(s"graft-${Integer.toHexString(table.hashCode)}",
          schemaJson, partCols.toList), null),
        Row(null, null, protoRow)) ++
      adds.map(a =>
        Row(Row(reencode(a.path), a.pvals, a.size, a.modTime, true, dvRow(a)),
          null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val f = fs(spark, table)
    val staging = s"$table/_delta_log/.ckpt_stage_$v"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = f.listStatus(new Path(staging))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val ckptPath = new Path(f"$table/_delta_log/$v%020d.checkpoint.parquet")
    f.delete(ckptPath, false)
    require(f.rename(part, ckptPath),
      s"failed to install checkpoint $part -> $ckptPath")
    f.delete(new Path(staging), true)
    val lp = f.create(new Path(s"$table/_delta_log/_last_checkpoint"), true)
    try lp.write(s"""{"version":$v,"size":${rows.size}}""".getBytes("UTF-8"))
    finally lp.close()
    v
  }

  /** Write a V2 CHECKPOINT at `version` (PROTOCOL.md §V2 Spec): the
    * add actions land in ONE parquet SIDECAR under
    * `_delta_log/_sidecars/`, and a UUID-named JSON manifest
    * (`<v>.checkpoint.<uuid>.json`) carries `checkpointMetadata`,
    * `metaData`, a protocol with the `v2Checkpoint` table feature, and
    * one `sidecar` action per sidecar file. V2 is how large real
    * tables checkpoint incrementally — sidecars can be reused across
    * checkpoints, so the manifest stays O(sidecars) while classic
    * checkpoints rewrite every add row each time. */
  def writeCheckpointV2(spark: SparkSession, table: String,
      version: Option[Long] = None): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val v = version.getOrElse(versions(spark, table).last)
    val (adds, partCols, schemaJson) = replay(spark, table, Some(v))
    val hasDv = adds.exists(_.dv.exists(_.cardinality > 0))
    def reencode(p: String): String =
      if (p.contains(":/")) p else DeltaExport.encodePath(p)
    def dvRow(a: LiveAdd): Row = a.dv.filter(_.cardinality > 0).map(d =>
      Row(d.storageType, d.pathOrInlineDv, d.offset, d.sizeInBytes,
        d.cardinality)).orNull
    val f = fs(spark, table)
    val uuid = java.util.UUID.randomUUID().toString
    // sidecar parquet: top-level `add` struct rows (the sidecar file
    // schema — readers select add.* exactly as from a classic file)
    val sidecarSchema = StructType(Seq(StructField("add", addT)))
    val sidecarRows = adds.map(a => Row(
      Row(reencode(a.path), a.pvals, a.size, a.modTime, true, dvRow(a))))
    val staging = s"$table/_delta_log/.ckpt2_stage_$v"
    spark.createDataFrame(
        spark.sparkContext.parallelize(sidecarRows, 1), sidecarSchema)
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = f.listStatus(new Path(staging))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val sidecarName = s"$uuid.parquet"
    f.mkdirs(new Path(s"$table/_delta_log/_sidecars"))
    val sidecarPath = new Path(s"$table/_delta_log/_sidecars/$sidecarName")
    f.delete(sidecarPath, false)
    require(f.rename(part.getPath, sidecarPath),
      s"failed to install checkpoint sidecar ${part.getPath} -> $sidecarPath")
    f.delete(new Path(staging), true)
    val sidecarLen = part.getLen // rename preserves length — no re-stat
    // JSON manifest
    val mapper = new ObjectMapper()
    def js(s: String) = mapper.writeValueAsString(s)
    val feats = (Seq("v2Checkpoint") ++ (if (hasDv) Seq("deletionVectors")
      else Nil)).map(js).mkString("[", ",", "]")
    val lines = Seq(
      s"""{"checkpointMetadata":{"version":$v}}""",
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":$feats,"writerFeatures":$feats}}""",
      s"""{"metaData":{"id":${js(s"graft-${Integer.toHexString(table.hashCode)}")},"schemaString":${js(schemaJson)},"partitionColumns":${partCols.map(js).mkString("[", ",", "]")},"format":{"provider":"parquet","options":{}},"configuration":{}}}""",
      s"""{"sidecar":{"path":${js(sidecarName)},"sizeInBytes":$sidecarLen,"modificationTime":${System.currentTimeMillis()}}}""")
    val manifest = f.create(
      new Path(f"$table/_delta_log/$v%020d.checkpoint.$uuid.json"), true)
    try manifest.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally manifest.close()
    val lp = f.create(new Path(s"$table/_delta_log/_last_checkpoint"), true)
    try lp.write(
      s"""{"version":$v,"size":${adds.size + 3},"sizeInBytes":$sidecarLen,"checkpointSchema":null}"""
        .getBytes("UTF-8"))
    finally lp.close()
    v
  }

  /** Minimal protocol-conformant writer (commit granularity): write
    * the DataFrame as parquet files and append one log commit adding
    * them (plus `removePaths` tombstones). Exists so tests and the
    * gate can build REAL protocol layouts; production writes stay on
    * the engine's own lake format. */
  def commit(df: DataFrame, table: String,
      removePaths: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val f = fs(spark, table)
    val version = if (f.exists(new Path(s"$table/_delta_log")))
      versions(spark, table).lastOption.map(_ + 1).getOrElse(0L) else 0L
    val staging = s"$table/_staging_v$version"
    df.write.mode("overwrite").parquet(staging)
    val parts = f.listStatus(new Path(staging))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val named = parts.zipWithIndex.map { case (st, i) =>
      val dest = s"part-$version-$i.snappy.parquet"
      require(f.rename(st.getPath, new Path(s"$table/$dest")),
        s"failed to install data file $dest")
      // rename preserves length and mtime — carry the staging stat
      (dest, st.getLen, st.getModificationTime)
    }
    f.delete(new Path(staging), true)
    val mapper = new ObjectMapper()
    val sb = new StringBuilder
    if (version == 0L) {
      sb.append("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""").append('\n')
      val schemaJson = mapper.writeValueAsString(df.schema.json)
      sb.append(s"""{"metaData":{"id":"graft-${table.hashCode}","format":{"provider":"parquet"},"schemaString":$schemaJson,"partitionColumns":[]}}""").append('\n')
    }
    removePaths.foreach { p =>
      sb.append(s"""{"remove":{"path":${mapper.writeValueAsString(p)},"deletionTimestamp":0,"dataChange":true}}""").append('\n')
    }
    named.foreach { case (p, len, mtime) =>
      sb.append(s"""{"add":{"path":${mapper.writeValueAsString(p)},"partitionValues":{},"size":$len,"modificationTime":$mtime,"dataChange":true}}""").append('\n')
    }
    val logPath = new Path(f"$table/_delta_log/$version%020d.json")
    val out = f.create(logPath, false)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
    version
  }
}
