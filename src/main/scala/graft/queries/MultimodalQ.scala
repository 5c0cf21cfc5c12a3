package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import util._

/** Multimodal plumbing queries — binary payload synthesized from
  * document text (no media libs in the container; decode is a
  * deterministic stub, see operators.Multimodal). The oracle mirrors
  * the stub arithmetic on octet lengths.
  */
object MultimodalQ extends graft.QueryArea {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Audio feature extraction that actually COMPUTES (the rest of the
    // multimodal family stubs the codec — here the "decoded PCM" is a
    // deterministic int16 waveform, so per-frame RMS energy runs end
    // to end and the oracle recomputes it): 1600 samples/doc, 10
    // frames of 160; sums are exact integers, so the sqrt is
    // bit-identical. All scan-side HOFs — no shuffle, no UDF.
    "mm_audio_rms" -> ((spark, dir) => {
      val audio = t(spark, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          transform(sequence(lit(0), lit(1599)),
            i => ((col("doc_id") * 31 + i * 17) % 2048 - 1024).cast("int"))
            .as("pcm"))
      audio
        .select(col("doc_id"), explode(sequence(lit(0), lit(9))).as("frame"),
          col("pcm"))
        .withColumn("fr", slice(col("pcm"), col("frame") * 160 + 1, lit(160)))
        .select(col("doc_id"), col("frame"),
          round(sqrt(aggregate(col("fr"), lit(0L),
            (acc, s) => acc + s.cast("long") * s.cast("long"))
            .cast("double") / 160.0), 6).as("rms"))
        .orderBy("doc_id", "frame")
    }),
    "mm_decode_meta" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.decodeImages(docs, "payload")
        .select(col("doc_id"), col("meta.width").as("w"), col("meta.height").as("h"),
          col("meta.channels").as("c"), col("meta.format").as("fmt"))
        .orderBy(col("doc_id"))
    }),
    "mm_resize_stats" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val decoded = Multimodal.decodeImages(docs, "payload")
      Multimodal.resizeMeta(decoded, "meta", 224, 224)
        .groupBy(col("resized.format").as("fmt"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("resized.scale_x")), 6).as("avg_sx"),
          max(col("meta.width")).as("max_w"))
        .orderBy(col("fmt"))
    }),
    "mm_frame_sample" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.sampleFrames(docs, "doc_id", "payload")
        .orderBy(col("doc_id"), col("frame_idx"))
    }))

  def oracles: Map[String, String] = Map(
    "mm_audio_rms" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 1599),
        |      i -> CAST((doc_id * 31 + i * 17) % 2048 - 1024 AS INT)) AS pcm
        |  FROM documents WHERE doc_id < 50),
        |fr AS (
        |  SELECT doc_id, unnest(generate_series(0, 9)) AS frame, pcm FROM a),
        |sl AS (
        |  SELECT doc_id, CAST(frame AS INT) AS frame,
        |    pcm[frame * 160 + 1 : frame * 160 + 160] AS f
        |  FROM fr)
        |SELECT doc_id, frame,
        |  round(sqrt(CAST(list_sum(list_transform(f,
        |    s -> CAST(s AS BIGINT) * s)) AS DOUBLE) / 160.0), 6) AS rms
        |FROM sl ORDER BY doc_id, frame""".stripMargin,
    "mm_decode_meta" ->
      """SELECT doc_id,
        |  CAST(64 + length(text) % 512 AS INT) AS w,
        |  CAST(64 + (length(text) * 7) % 512 AS INT) AS h,
        |  CAST(3 AS INT) AS c,
        |  CASE WHEN length(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_resize_stats" ->
      """SELECT CASE WHEN length(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  count(*) AS n,
        |  round(avg(round((64 + length(text) % 512) / 224.0, 6)), 6) AS avg_sx,
        |  CAST(max(64 + length(text) % 512) AS INT) AS max_w
        |FROM documents GROUP BY 1 ORDER BY fmt""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(length(text) % 8 + 1 AS INT) AS n_frames,
        |  CAST(i AS INT) AS frame_idx
        |FROM documents, unnest(generate_series(0, length(text) % 8)) AS u(i)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
