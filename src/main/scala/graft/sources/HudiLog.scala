package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Codec for Hudi MERGE-ON-READ log files (public format:
  * hudi.apache.org/docs/concepts + the HoodieLogFormat description —
  * a log file is a sequence of BLOCKS, each framed
  * `#HUDI#` magic → length → format version → block type → header
  * map → content → footer map → total-length trailer, where data
  * blocks carry Avro-binary records (writer schema in the SCHEMA
  * header) and delete blocks carry the tombstoned record keys). The
  * reference reads these through its Hudi connector
  * (`fe/fe-core/src/main/java/com/starrocks/connector/hudi/`); this
  * is an independent implementation of the open layout on avro-core.
  *
  * Framing written/read here (lengths big-endian):
  * {{{
  *   6B  magic "#HUDI#"
  *   u32 format version (1)
  *   u32 block type (1 = avro data, 2 = delete, 3 = command)
  *   u32 header count, then per header: u32 key, u32 len, utf8 bytes
  *       (keys: 0 = INSTANT_TIME, 2 = SCHEMA)
  *   u64 content length, content bytes
  *   u32 footer count (same wire shape as headers)
  *   u64 total block length (enables reverse scans)
  * }}}
  * Data-block content: u32 record count, then per record u32 size +
  * Avro binary (the header SCHEMA's writer schema). Delete-block
  * content: u32 key count, then per key u32 len + utf8 record key.
  *
  * Row conversion covers the primitive lattice the gates use
  * (long/int/double/float/boolean/string/timestamp-micros/date);
  * nested types are out of scope for the interop surface.
  */
object HudiLog {

  val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")
  val DataBlock = 1
  val DeleteBlock = 2

  /** Header metadata keys (the public HeaderMetadataType ordinals). */
  val HInstantTime = 0
  val HSchema = 2

  sealed trait Block { def instantTime: String }
  final case class Data(instantTime: String, schemaJson: String,
      records: Seq[GenericRecord]) extends Block
  final case class Delete(instantTime: String, keys: Seq[String]) extends Block

  // ---- Avro <-> Spark schema/row bridging ----

  def avroSchemaFor(st: StructType, name: String = "record"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { fd =>
      val base = fd.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case TimestampType =>
          val s = Schema.create(Schema.Type.LONG)
          org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
        case DateType =>
          val s = Schema.create(Schema.Type.INT)
          org.apache.avro.LogicalTypes.date().addToSchema(s)
        case other => throw new IllegalArgumentException(
          s"unsupported log-record type for ${fd.name}: $other")
      }
      val sch = Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      fields.add(new Schema.Field(fd.name, sch, null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(name, null, "graft.hudi", false, fields)
  }

  def rowToAvro(schema: Schema, st: StructType, r: Row): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (fd, i) =>
      val v: AnyRef =
        if (r.isNullAt(i)) null
        else fd.dataType match {
          case TimestampType =>
            val t = r.getTimestamp(i)
            Long.box(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
          case DateType => Int.box(r.getDate(i).toLocalDate.toEpochDay.toInt)
          case StringType => r.getString(i)
          case _ => r.get(i).asInstanceOf[AnyRef]
        }
      rec.put(fd.name, v)
    }
    rec
  }

  /** One avro value → the JVM value Spark's Row encoder takes, typed
    * by the Spark field type — recursive, so real tables' array/map/
    * struct columns convert too. */
  private def avroValue(dt: DataType, v: Any): Any =
    if (v == null) null
    else dt match {
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case StringType => v.toString
      case BinaryType => v match {
        case bb: java.nio.ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case a: Array[Byte] => a
      }
      case at: ArrayType =>
        import scala.jdk.CollectionConverters._
        v.asInstanceOf[java.util.Collection[_]].asScala
          .map(avroValue(at.elementType, _)).toSeq
      case mt: MapType =>
        import scala.jdk.CollectionConverters._
        v.asInstanceOf[java.util.Map[_, _]].asScala
          .map { case (k, x) => k.toString -> avroValue(mt.valueType, x) }.toMap
      case st: StructType =>
        val r = v.asInstanceOf[GenericRecord]
        Row(st.fields.map(f => avroValue(f.dataType,
          if (r.getSchema.getField(f.name) == null) null
          else r.get(f.name))).toIndexedSeq: _*)
      case _ => v
    }

  def avroToRow(st: StructType, rec: GenericRecord): Row =
    Row(st.fields.map { fd =>
      avroValue(fd.dataType,
        if (rec.getSchema.getField(fd.name) == null) null else rec.get(fd.name))
    }.toIndexedSeq: _*)

  // ---- block wire codec ----

  private def writeHeaders(out: java.io.DataOutputStream,
      hs: Seq[(Int, String)]): Unit = {
    out.writeInt(hs.size)
    hs.foreach { case (k, v) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(k); out.writeInt(b.length); out.write(b)
    }
  }

  private def readHeaders(in: java.io.DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    (0 until n).map { _ =>
      val k = in.readInt()
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      k -> new String(b, "UTF-8")
    }.toMap
  }

  private def frameBlock(blockType: Int, headers: Seq[(Int, String)],
      content: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Magic)
    out.writeInt(1) // format version
    out.writeInt(blockType)
    writeHeaders(out, headers)
    out.writeLong(content.length.toLong)
    out.write(content)
    out.writeInt(0) // footer count
    out.writeLong(0L) // placeholder, patched below
    out.flush()
    val bytes = bos.toByteArray
    val total = bytes.length.toLong
    val bb = java.nio.ByteBuffer.wrap(bytes, bytes.length - 8, 8)
    bb.putLong(total)
    bytes
  }

  def dataBlockBytes(instant: String, schema: Schema,
      records: Seq[GenericRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(records.size)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    records.foreach { r =>
      val rb = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(rb, null)
      writer.write(r, enc); enc.flush()
      val b = rb.toByteArray
      out.writeInt(b.length); out.write(b)
    }
    out.flush()
    frameBlock(DataBlock,
      Seq(HInstantTime -> instant, HSchema -> schema.toString), bos.toByteArray)
  }

  def deleteBlockBytes(instant: String, keys: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(keys.size)
    keys.foreach { k =>
      val b = k.getBytes("UTF-8"); out.writeInt(b.length); out.write(b)
    }
    out.flush()
    frameBlock(DeleteBlock, Seq(HInstantTime -> instant), bos.toByteArray)
  }

  /** Append blocks to a log file (Hudi appends blocks to open log
    * files; on filesystems without append this writer creates the
    * next `.log.N` roll instead — the caller picks the path). */
  def writeLogFile(spark: SparkSession, path: String,
      blocks: Seq[Array[Byte]]): Unit = {
    val f = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new Path(path), false)
    try blocks.foreach(out.write) finally out.close()
  }

  /** Parse every block of a log file, in write order. Unknown block
    * types are SKIPPED by their recorded length (the format's forward-
    * compat contract), never errors. */
  def readLogFile(spark: SparkSession, path: String): Seq[Block] =
    readLogFile(spark.sparkContext.hadoopConfiguration, path)

  /** Session-free variant for EXECUTOR-side decode (the distributed
    * MoR fold ships log paths, not records — each task decodes its
    * files against the task-local Hadoop configuration). */
  def readLogFile(conf: org.apache.hadoop.conf.Configuration,
      path: String): Seq[Block] = {
    val f = new Path(path).getFileSystem(conf)
    val st = f.getFileStatus(new Path(path))
    val raw = new Array[Byte](st.getLen.toInt)
    val in0 = f.open(new Path(path))
    try in0.readFully(0, raw) finally in0.close()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(raw))
    val blocks = scala.collection.mutable.ArrayBuffer[Block]()
    while (in.available() > 0) {
      val magic = new Array[Byte](Magic.length)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"corrupt log block magic in $path")
      // TWO framings: this writer's (u32 version=1 right after the
      // magic) and REAL hudi's (u64 block size first, then version) —
      // disambiguated by the first u32: a real block's size high word
      // is 0 for any block under 4 GB, ours is the version 1.
      val first = in.readInt()
      val realFraming = first == 0
      val ver = if (realFraming) { in.readInt(); in.readInt() } else first
      require(ver == 1, s"unsupported log format version $ver in $path")
      val blockType = in.readInt()
      val headers = readHeaders(in)
      val contentLen = in.readLong()
      val content = new Array[Byte](contentLen.toInt)
      in.readFully(content)
      val footerN = in.readInt()
      (0 until footerN).foreach { _ =>
        in.readInt(); val l = in.readInt(); in.skipBytes(l)
      }
      in.readLong() // total length trailer
      val instant = headers.getOrElse(HInstantTime, "")
      val cin = new java.io.DataInputStream(new java.io.ByteArrayInputStream(content))
      // real hudi block-type ordinals: COMMAND=0, DELETE=1, CORRUPT=2,
      // AVRO=3; this writer's: DATA=1, DELETE=2
      val isData = if (realFraming) blockType == 3 else blockType == DataBlock
      val isDelete = if (realFraming) blockType == 1 else blockType == DeleteBlock
      if (isData) {
        val schema = new Schema.Parser().parse(headers(HSchema))
        val reader = new GenericDatumReader[GenericRecord](schema)
        // real avro-block content leads with its own format version
        if (realFraming) cin.readInt()
        val n = cin.readInt()
        val recs = (0 until n).map { _ =>
          val len = cin.readInt()
          val b = new Array[Byte](len); cin.readFully(b)
          reader.read(null, DecoderFactory.get().binaryDecoder(b, null))
        }
        blocks += Data(instant, headers(HSchema), recs)
      } else if (isDelete) {
        if (realFraming) throw new IllegalArgumentException(
          s"real-format hudi DELETE block in $path: its kryo-serialized " +
            "DeleteRecord payload has no public byte spec — compact the " +
            "table (rewrite the base) and use the timeline-indexed read")
        val n = cin.readInt()
        val keys = (0 until n).map { _ =>
          val len = cin.readInt()
          val b = new Array[Byte](len); cin.readFully(b)
          new String(b, "UTF-8")
        }
        blocks += Delete(instant, keys)
      } // else command/corrupt/unknown: recorded length already consumed
    }
    blocks.toSeq
  }
}
