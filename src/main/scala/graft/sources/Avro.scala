package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal Avro ingestion (reference `be/src/formats/avro/`) — the
  * spark-avro DSv2 module is not in the image's jar set (offline), but
  * avro-core is, so this hand-rolls the container-file codec over the
  * same distributed shape:
  *
  *  - READ: one task per container file (files parallelized across the
  *    cluster), each task streams GenericRecords straight off its
  *    FileSystem input — no driver-side IO, memory bounded by one
  *    record block;
  *  - WRITE: per-partition DataFileWriter to `part-N.avro` —
  *    deterministic names, so a task retry overwrites its own file
  *    (idempotent, the same property the routine-load sink uses).
  *
  * Type surface (the testdata's, and the reference loader's common
  * core): long/int/double/float/boolean/string/bytes/date/
  * timestamp-micros, nullable via `union(null, T)`. A production
  * version would implement Spark's `FileFormat` instead to inherit
  * split planning and the vectorized path — this is the ingestion
  * semantics, not a performance claim.
  */
object Avro {

  // ---------------- schema mapping ----------------

  def avroSchema(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"avro: unsupported type $other for field ${f.name}")
      }
      val s = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord("row", null, "graft", false, fields.toList.asJava)
  }

  // ---------------- write ----------------

  def writeAvro(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchema(schema).toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    Formats.deleteDir(df.sparkSession, dir)
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val avro = new Schema.Parser().parse(avroJson)
      val path = new Path(s"$dir/part-$i.avro")
      val fs = path.getFileSystem(conf.value)
      val out = fs.create(path, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avro)).create(avro, out)
      try rows.foreach { row =>
        val rec = new GenericData.Record(avro)
        schema.fields.zipWithIndex.foreach { case (f, j) =>
          rec.put(f.name, toAvro(row, j, f.dataType))
        }
        writer.append(rec)
      } finally writer.close()
      Iterator.single(1)
    }.count() // action: materialize the writes
  }

  private def toAvro(row: Row, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null else dt match {
      case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
      case DateType => Int.box(row.getDate(i).toLocalDate.toEpochDay.toInt)
      case TimestampType =>
        val t = row.getTimestamp(i)
        Long.box(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      case _ => row.get(i).asInstanceOf[AnyRef]
    }

  // ---------------- read ----------------

  def readAvro(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root).map(_.getPath.toString)
      .filter(_.endsWith(".avro")).sorted.toSeq
    val parallelism = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(files, parallelism).flatMap { f =>
      val in = new Path(f).getFileSystem(conf.value).open(new Path(f))
      val reader = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
        def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(schema.fields.toSeq.map(fd => fromAvro(rec.get(fd.name), fd.dataType)))
        }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any =
    if (v == null) null else dt match {
      case StringType => v.toString // avro Utf8 → String
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Number].longValue()))
      case TimestampType =>
        val micros = v.asInstanceOf[Number].longValue()
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case _ => v
    }
}
