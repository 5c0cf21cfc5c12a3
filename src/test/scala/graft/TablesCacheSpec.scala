package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The Tables metadata cache must never serve a stale file index: a
  * base-table path regenerated mid-session (overwrite) has to be
  * visible to the next load/registerAll. The cache keys entries on the
  * table file's mtime for exactly this. */
class TablesCacheSpec extends SparkSuite {
  import spark.implicits._

  test("re-registering after an overwrite sees new data") {
    val dir = Files.createTempDirectory("graft-tables-cache").toString
    // Tables.registerAll registers all ten names — materialize each as
    // a tiny one-row parquet file so registration succeeds
    Tables.names.foreach { n =>
      Seq((1L, "v1")).toDF("id", "payload")
        .coalesce(1).write.parquet(s"$dir/$n.parquet.tmp")
      val part = Files.list(Paths.get(s"$dir/$n.parquet.tmp")).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(s"$dir/$n.parquet"))
    }
    Tables.registerAll(spark, dir)
    assert(spark.sql("SELECT payload FROM customer").head().getString(0) == "v1")
    assert(Tables.load(spark, dir, "customer").select(col("payload"))
      .head().getString(0) == "v1")

    // overwrite ONE table file in place (new mtime, new contents)
    Thread.sleep(1100) // local FS mtime granularity can be 1 s
    Files.delete(Paths.get(s"$dir/customer.parquet"))
    Seq((2L, "v2")).toDF("id", "payload")
      .coalesce(1).write.parquet(s"$dir/customer.parquet.tmp2")
    val part2 = Files.list(Paths.get(s"$dir/customer.parquet.tmp2")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part2), Paths.get(s"$dir/customer.parquet"))

    // the cache must miss on the changed mtime: fresh load AND fresh view
    assert(Tables.load(spark, dir, "customer").select(col("payload"))
      .head().getString(0) == "v2")
    Tables.registerAll(spark, dir)
    assert(spark.sql("SELECT payload FROM customer").head().getString(0) == "v2")

    // restore the shared session's standard views for later suites
    Tables.registerAll(spark, sf)
  }
}
