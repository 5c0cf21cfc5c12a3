package graft

import graft.sources.IcebergRead
import org.apache.spark.sql.functions.{lit, sum}

/** Iceberg metadata→manifest-list→manifest→files replay: appends,
  * overwrite snapshots, snapshot-id time travel. */
class IcebergReadSpec extends SparkSuite {
  import spark.implicits._

  test("snapshot chain: append, append, overwrite; time travel by id") {
    val table = java.nio.file.Files.createTempDirectory("graft-ice").toString
    val a = Seq((1L, "a")).toDF("id", "v")
    val b = Seq((2L, "b")).toDF("id", "v")
    val c = Seq((3L, "c")).toDF("id", "v")
    val s1 = IcebergRead.commitSnapshot(a.coalesce(1), table)
    val s2 = IcebergRead.commitSnapshot(b.coalesce(1), table)
    IcebergRead.commitSnapshot(c.coalesce(1), table, carryForward = false)
    def ids(snap: Option[Long]) = IcebergRead.read(spark, table, snap)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids(None) === Set(3L))          // overwrite replaced the table
    assert(ids(Some(s2)) === Set(1L, 2L))  // append chain at snapshot 2
    assert(ids(Some(s1)) === Set(1L))
    intercept[IllegalArgumentException] {
      IcebergRead.dataFiles(spark,
        java.nio.file.Files.createTempDirectory("ni").toString)
    }
  }

  test("Lake write -> Iceberg metadata export -> Iceberg read round trip") {
    import graft.sources.{IcebergExport, Lake}
    val table = java.nio.file.Files.createTempDirectory("graft-iexp").toString
    Lake.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), table, Nil)
    Lake.write(Seq((3L, 30.0)).toDF("id", "v"), table, Nil, mode = "append")
    Lake.delete(spark, table, $"id" === 2L)
    assert(IcebergExport.exportIcebergMeta(spark, table) === 3L)
    def ids(snap: Option[Long]) = IcebergRead.read(spark, table, snap)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids(None) === Set(1L, 3L))
    assert(ids(Some(1L)) === Set(1L, 2L))
    assert(ids(Some(2L)) === Set(1L, 2L, 3L))
    // incremental + idempotent: another Lake commit, re-export
    Lake.write(Seq((4L, 40.0)).toDF("id", "v"), table, Nil, mode = "append")
    assert(IcebergExport.exportIcebergMeta(spark, table) === 4L)
    assert(ids(None) === Set(1L, 3L, 4L))
    // same files, zero data copies: lake read agrees
    assert(Lake.read(spark, table).select($"id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L, 4L))
  }

  test("partitioned export: typed partition column restored from manifest, pruning from the manifest") {
    import graft.sources.{IcebergExport, Lake}
    val table = java.nio.file.Files.createTempDirectory("graft-icepart").toString + "/t"
    val df = Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"),
      (4L, 40.0, "b"), (5L, 50.0, "c")).toDF("id", "v", "p")
    Lake.write(df, table, Seq("p"))
    Lake.write(Seq((6L, 60.0, "c")).toDF("id", "v", "p"), table, Seq("p"), mode = "append")
    IcebergExport.exportIcebergMeta(spark, table)
    // spec fields recorded with identity transform + source type
    assert(IcebergRead.partitionSpecFields(spark, table) === Seq("p" -> "string"))
    // full read restores the typed partition column from the manifest
    val all = IcebergRead.read(spark, table)
    assert(all.schema("p").dataType === org.apache.spark.sql.types.StringType)
    assert(all.select($"id", $"p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"), (6L, "c")))
    // a partition filter prunes FILES via the manifest-backed index —
    // never touching directory names or non-matching files
    val (pruned, Some(index)) = IcebergRead.readIndexed(spark, table): @unchecked
    val got = pruned.filter($"p" === "c").select($"id").collect().map(_.getLong(0)).toSet
    assert(got === Set(5L, 6L))
    assert(index.lastSelectedFileCount < index.totalFileCount,
      s"partition filter selected ${index.lastSelectedFileCount} of ${index.totalFileCount} files — no pruning happened")
    // snapshot-id time travel still works on the partitioned table
    val v1 = IcebergRead.read(spark, table, Some(1L))
    assert(v1.count() === 5)
    // the sf-typed case: a LONG partition column round-trips typed
    val t2 = java.nio.file.Files.createTempDirectory("graft-icepart2").toString + "/t"
    Lake.write(Seq((1L, "x", 7L), (2L, "y", 8L)).toDF("id", "s", "k"), t2, Seq("k"))
    IcebergExport.exportIcebergMeta(spark, t2)
    assert(IcebergRead.partitionSpecFields(spark, t2) === Seq("k" -> "long"))
    val r2 = IcebergRead.read(spark, t2)
    assert(r2.schema("k").dataType === org.apache.spark.sql.types.LongType)
    assert(r2.filter($"k" === 8L).select($"id").head.getLong(0) === 2L)
  }

  test("MoR export: delete vectors land as format v2 position deletes") {
    import graft.sources.{IcebergExport, Lake}
    // a path WITH SPACES: the delete-row translation must bridge the
    // percent-encoded _metadata rendering and the raw manifest form
    val table = java.nio.file.Files.createTempDirectory("graft-ice mor").toString + "/t 1"
    val df = spark.range(0, 1000).select($"id".as("k"),
      ($"id" % 5).cast("int").as("g"), ($"id" * 3).cast("double").as("x"))
    Lake.write(df.repartition(4), table, Nil)
    Lake.deleteMor(spark, table, $"k" % 10 === 3)
    Lake.mergeMor(spark, table,
      spark.range(0, 50).select($"id".as("k"), lit(9).cast("int").as("g"),
        lit(-1.0).as("x")), Seq("k"))
    IcebergExport.exportIcebergMeta(spark, table)
    assert(IcebergRead.positionDeleteFiles(spark, table).size === 1)
    // current snapshot: Iceberg read equals the masked Lake read
    val ice = IcebergRead.read(spark, table)
    val lake = Lake.read(spark, table)
    assert(ice.count() === lake.count())
    assert(ice.agg(sum($"k"), sum($"x")).collect()(0) ===
      lake.agg(sum($"k"), sum($"x")).collect()(0))
    assert(ice.filter($"g" === 9).count() === 50L)
    assert(ice.filter($"k" % 10 === 3 && $"g" =!= 9).count() === 0L)
    // time travel: v1 has no delete manifest and reads unmasked
    assert(IcebergRead.positionDeleteFiles(spark, table, Some(1L)).isEmpty)
    assert(IcebergRead.read(spark, table, Some(1L)).count() === 1000L)
    // v2 (deleteMor only) masks the deletes but not the merge
    assert(IcebergRead.read(spark, table, Some(2L)).count() === 900L)
  }

  test("MoR export: partitioned table masks through the manifest index") {
    import graft.sources.{IcebergExport, Lake}
    val table = java.nio.file.Files.createTempDirectory("graft-icemp").toString + "/t"
    val df = spark.range(0, 600).select($"id".as("k"),
      ($"id" % 3).cast("string").as("p"), ($"id" * 2).cast("double").as("x"))
    Lake.write(df, table, Seq("p"))
    Lake.deleteMor(spark, table, $"k" < 100)
    IcebergExport.exportIcebergMeta(spark, table)
    val ice = IcebergRead.read(spark, table)
    assert(ice.count() === 500L)
    assert(ice.filter($"k" < 100).count() === 0L)
    assert(ice.filter($"p" === "1").count() ===
      (100 until 600).count(_ % 3 == 1).toLong)
    assert(ice.schema("p").dataType === org.apache.spark.sql.types.StringType)
  }

  test("Delta/Hudi export skip DV snapshots; dirty current fails loudly") {
    import graft.sources.{DeltaExport, DeltaRead, HudiExport, Lake}
    val table = java.nio.file.Files.createTempDirectory("graft-dmor").toString + "/t"
    Lake.write(spark.range(0, 100).select($"id".as("k"),
      ($"id" * 2).cast("double").as("x")), table, Nil)
    Lake.deleteMor(spark, table, $"k" < 10)          // v2 dirty
    intercept[IllegalArgumentException] {
      DeltaExport.exportDeltaLog(spark, table)
    }
    intercept[IllegalArgumentException] {
      HudiExport.exportHudiTimeline(spark, table)
    }
    Lake.foldDeletes(spark, table)                    // v3 clean
    DeltaExport.exportDeltaLog(spark, table)
    // two clean snapshots → Delta versions 0 and 1; v2 is skipped
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val logs = f.listStatus(new org.apache.hadoop.fs.Path(s"$table/_delta_log"))
      .map(_.getPath.getName).filter(_.endsWith(".json")).sorted
    assert(logs.length === 2)
    assert(DeltaRead.read(spark, table).count() === 90L)
    assert(DeltaRead.read(spark, table).filter($"k" < 10).count() === 0L)
    HudiExport.exportHudiTimeline(spark, table)
    assert(graft.sources.HudiRead.read(spark, table).count() === 90L)
  }

  test("unpadded HadoopCatalog metadata names: v10 beats v9 numerically") {
    val table = java.nio.file.Files.createTempDirectory("graft-ice10").toString
    IcebergRead.commitSnapshot(Seq((1L, "old")).toDF("id", "v").coalesce(1), table)
    IcebergRead.commitSnapshot(Seq((2L, "new")).toDF("id", "v").coalesce(1), table)
    // rename the padded writer names to real HadoopCatalog unpadded
    // names where lexicographic order inverts ("v9" > "v10")
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$table/metadata")
    val metas = f.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json")).sortBy(_.getName)
    assert(metas.length === 2)
    f.rename(metas(0), new org.apache.hadoop.fs.Path(s"$table/metadata/v9.metadata.json"))
    f.rename(metas(1), new org.apache.hadoop.fs.Path(s"$table/metadata/v10.metadata.json"))
    val ids = IcebergRead.read(spark, table)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L), "reader served the stale v9 snapshot")
  }
}
