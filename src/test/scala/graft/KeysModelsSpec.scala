package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.KeysModels

class KeysModelsSpec extends SparkSuite {
  import spark.implicits._

  test("upsertView keeps latest version and honors delete markers") {
    val rows = Seq(
      (1L, "a", 1, false), (1L, "b", 2, false),
      (2L, "x", 1, false), (2L, "y", 2, true),
      (3L, "k", 1, false)
    ).toDF("id", "v", "ver", "del")
    val out = KeysModels.upsertView(rows, Seq("id"), "ver", Some("del"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "b"), (3L, "k")))
  }

  test("mergeInto: source wins on match, inserts on no-match") {
    val target = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal")
    val source = Seq((2L, 99.0), (3L, 30.0)).toDF("id", "bal")
    val out = KeysModels.mergeInto(target, source, Seq("id"))
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("partialUpdate: provided columns win (incl. explicit NULL), others kept, inserts NULL-fill") {
    val target = Seq((1L, "a", 10.0, "s1"), (2L, "b", 20.0, "s2"),
      (3L, "c", 30.0, "s3")).toDF("id", "name", "bal", "seg")
    val source = Seq((2L, Option(99.0)), (3L, Option.empty[Double]),
      (4L, Option(40.0))).toDF("id", "bal")
    val out = KeysModels.partialUpdate(target, source, Seq("id"))
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, "a", Some(10.0), "s1"),   // untouched
      (2L, "b", Some(99.0), "s2"),   // bal updated, name/seg kept
      (3L, "c", None, "s3"),         // explicit NULL wins over stored 30.0
      (4L, null, Some(40.0), null))) // insert: unprovided columns NULL
    // column order and names preserved
    assert(KeysModels.partialUpdate(target, source, Seq("id")).columns.toSeq
      === Seq("id", "name", "bal", "seg"))
  }

  test("update/delete rewrite semantics") {
    val df = Seq((1L, 5.0), (2L, 6.0), (3L, 7.0)).toDF("id", "x")
    val updated = KeysModels.update(df, $"id" === 2, Map("x" -> lit(100.0)))
      .orderBy($"id").collect().map(_.getDouble(1))
    assert(updated.toSeq === Seq(5.0, 100.0, 7.0))
    val deleted = KeysModels.delete(df, $"id" === 1)
    assert(deleted.count() === 2)
  }

  test("atomicOverwrite round-trips through a directory swap") {
    val dir = Files.createTempDirectory("graft-keys").toString + "/t"
    val v1 = Seq((1L, "a")).toDF("id", "v")
    KeysModels.atomicOverwrite(v1, dir)
    assert(spark.read.parquet(dir).count() === 1)
    val v2 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    KeysModels.atomicOverwrite(v2, dir)
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("atomicOverwrite recovers a table stranded as .bak by a crash") {
    val base = Files.createTempDirectory("graft-recover").toString
    val dir = s"$base/t"
    val v1 = Seq((1L, "a")).toDF("id", "v")
    KeysModels.atomicOverwrite(v1, dir)
    // simulate a crash between the two renames: dst gone, only .bak left
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".bak-simulated"))
    // the next write must first restore, then swap in the new version
    val v2 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    KeysModels.atomicOverwrite(v2, dir)
    assert(spark.read.parquet(dir).count() === 2)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(base))
      .exists(_.getPath.getName.contains(".bak")), "stale backup left behind")
  }

  test("INSERT INTO SELECT via SQL on a temp table dir") {
    val dir = Files.createTempDirectory("graft-ins").toString + "/t"
    table("nation").write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("nation_copy")
    val before = spark.table("nation_copy").count()
    // append-mode insert (DUP_KEYS table semantics)
    table("nation").limit(5).write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() === before + 5)
  }
}
