package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * The reference treats media as opaque VARBINARY plus typed metadata
  * (SURVEY.md §1.2 TYPE_VARBINARY, `be/src/column/binary_column.h`);
  * decode/transform kernels live engine-side. Here the Spark-side
  * plumbing is real — BinaryType columns, struct metadata schema,
  * partition-parallel batch iteration via mapPartitions, explode for
  * frame sampling — while the actual codec calls are STUBBED with a
  * deterministic fake (this container has no image/audio libraries).
  * Swap `decodeStub` for a real JNI/javacv decode to productionize:
  * the signature (bytes → ImageMeta) and the batch shape stay the
  * same.
  *
  * Scale notes: decode runs inside mapPartitions — one task per input
  * split, no shuffle; frame sampling explodes AFTER the cheap
  * metadata pass so the wide binary column is never duplicated per
  * frame (project only (id, n_frames) before the explode).
  */
object Multimodal {

  case class ImageMeta(width: Int, height: Int, channels: Int, format: String)

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decode: deterministic metadata derived from payload length —
    * stands in for an image-header parse (`???` in a real build). */
  def decodeStub(bytes: Array[Byte]): ImageMeta = {
    val n = if (bytes == null) 0 else bytes.length
    ImageMeta(64 + n % 512, 64 + (n * 7) % 512, 3, if (n % 2 == 0) "png" else "jpeg")
  }

  /** Attach a decoded-metadata struct column. Runs partition-parallel
    * with one decode call per row, batched by Spark's iterators. */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", imageMetaSchema, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = decodeStub(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq :+ Row(m.width, m.height, m.channels, m.format))
      }
    }(enc)
  }

  /** "Resize": pure-metadata transform (the real kernel would emit new
    * bytes; the plumbing — column in, column out — is identical). */
  def resizeMeta(df: DataFrame, metaCol: String, targetW: Int, targetH: Int): DataFrame =
    df.withColumn("resized", struct(
      lit(targetW).as("width"), lit(targetH).as("height"),
      col(s"$metaCol.channels").as("channels"), col(s"$metaCol.format").as("format"),
      round(col(s"$metaCol.width").cast("double") / targetW, 6).as("scale_x"),
      round(col(s"$metaCol.height").cast("double") / targetH, 6).as("scale_y")))

  /** Frame sampling for "video" payloads: explode deterministic frame
    * indices (stub: n_frames = len % 8 + 1), binary column pruned
    * before the explode. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val nFrames = (octet_length(col(payloadCol)) % 8 + 1).cast("int")
    df.select(col(idCol), nFrames.as("n_frames"))
      .select(col(idCol), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
  }

  /** STUB feature extraction: fixed-width deterministic vector from
    * byte statistics (stands in for an embedding model call). */
  def extractFeatures(df: DataFrame, payloadCol: String, dims: Int = 8): DataFrame =
    df.withColumn("features", array((0 until dims).map { i =>
      (pmod(xxhash64(col(payloadCol), lit(i)), lit(1000)).cast("double") / 1000.0)
    }: _*))
}
