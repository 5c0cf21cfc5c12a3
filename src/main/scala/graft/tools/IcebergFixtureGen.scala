package graft.tools

import graft.Engine

/** One-shot generator for the PINNED real-spec Iceberg fixture under
  * `src/test/resources/fixtures/iceberg_foreign` (no real-engine
  * iceberg fixture exists in the reference, so this repo pins its own
  * spec-conformant bytes — the [[graft.sources.IcebergReal]] layout:
  * real field-ids, typed r102 partition records, full v2
  * metadata.json). Run once, commit the output; IcebergReadSpec
  * replays it against literal expectations so any reader or writer
  * drift breaks loudly. */
object IcebergFixtureGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/iceberg_foreign")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_date}
    graft.sources.Formats.deleteDir(spark, out)
    def batch(rows: Seq[(Long, String, Double, String)]) =
      rows.toDF("id", "category", "price", "d")
        .withColumn("event_date", to_date(col("d"))).drop("d")
        .coalesce(1)
    graft.sources.IcebergReal.commitAppend(batch(Seq(
      (1L, "fruit", 3.5, "2024-01-01"), (2L, "fruit", 4.0, "2024-01-01"),
      (3L, "tool", 20.5, "2024-01-02"))), out, Seq("event_date"))
    graft.sources.IcebergReal.commitAppend(batch(Seq(
      (4L, "tool", 9.25, "2024-01-02"), (5L, "book", 12.0, "2024-01-03"),
      (6L, "book", 7.75, "2024-01-03"))), out, Seq("event_date"))
    println(s"wrote $out")
    spark.stop()
  }
}
