package graft

import graft.sources.HudiRead

/** Hudi COW timeline replay: slice replacement, snapshot isolation. */
class HudiReadSpec extends SparkSuite {
  import spark.implicits._

  test("copy-on-write slice replacement and instant-as-of reads") {
    val table = java.nio.file.Files.createTempDirectory("graft-hudi").toString
    val g0a = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val g1 = Seq((10L, "x")).toDF("id", "v")
    val g0b = Seq((3L, "c")).toDF("id", "v")
    val i1 = HudiRead.commit(table, Map("g0" -> g0a, "g1" -> g1))
    val i2 = HudiRead.commit(table, Map("g0" -> g0b))
    assert(HudiRead.instants(spark, table) === Seq(i1, i2))
    // latest: g0 replaced, g1 untouched
    assert(HudiRead.read(spark, table).select($"id").collect()
      .map(_.getLong(0)).toSet === Set(3L, 10L))
    // as-of first instant: original slices
    assert(HudiRead.read(spark, table, Some(i1)).select($"id").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 10L))
    intercept[IllegalArgumentException] {
      HudiRead.instants(spark, java.nio.file.Files.createTempDirectory("nh").toString)
    }
  }

  test("Lake write -> Hudi timeline export -> Hudi read round trip") {
    import graft.sources.{HudiExport, Lake}
    val table = java.nio.file.Files.createTempDirectory("graft-hexp").toString
    Lake.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), table, Nil)
    Lake.write(Seq((3L, 30.0)).toDF("id", "v"), table, Nil, mode = "append")
    Lake.delete(spark, table, $"id" === 2L) // CoW: retires a file group
    val last = HudiExport.exportHudiTimeline(spark, table)
    assert(last === f"${3}%014d")
    def ids(asOf: Option[String]) = HudiRead.read(spark, table, asOf)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(ids(None) === Set(1L, 3L))
    assert(ids(Some(f"${1}%014d")) === Set(1L, 2L))
    assert(ids(Some(f"${2}%014d")) === Set(1L, 2L, 3L))
    // the delete instant is a replacecommit (file groups retired)
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$table/.hoodie/${f"${3}%014d"}.replacecommit")))
    // incremental + idempotent re-export after another commit
    Lake.write(Seq((4L, 40.0)).toDF("id", "v"), table, Nil, mode = "append")
    assert(HudiExport.exportHudiTimeline(spark, table) === f"${4}%014d")
    assert(ids(None) === Set(1L, 3L, 4L))
  }

  test("partitioned export: timeline-keyed partition restore + file pruning") {
    import graft.sources.{HudiExport, HudiRead, Lake}
    val table = java.nio.file.Files.createTempDirectory("graft-hudipart").toString + "/t"
    Lake.write(Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"),
      (4L, 40.0, "b b")).toDF("id", "v", "p"), table, Seq("p"))
    Lake.write(Seq((5L, 50.0, "c")).toDF("id", "v", "p"), table, Seq("p"), mode = "append")
    HudiExport.exportHudiTimeline(spark, table)
    // partitionPath keys carry the values (URL-encoded: "b b" round-trips)
    val slices = HudiRead.liveSliceDetails(spark, table)
    assert(slices.values.map(_.partitionPath).toSet
      .forall(pp => pp.startsWith("p=")))
    val all = HudiRead.read(spark, table)
    assert(all.schema("p").dataType === org.apache.spark.sql.types.StringType)
    assert(all.select($"id", $"p").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b b"), (5L, "c")))
    // a partition filter prunes files via the timeline-backed index
    val (df, Some(index)) = HudiRead.readIndexed(spark, table): @unchecked
    assert(df.filter($"p" === "c").select($"id").collect().map(_.getLong(0)).toSet === Set(5L))
    assert(index.lastSelectedFileCount < index.totalFileCount,
      s"selected ${index.lastSelectedFileCount}/${index.totalFileCount} — no pruning")
    // CoW delete on a partitioned table still replays (replacecommit
    // retires the partition's file group; re-export is incremental)
    Lake.delete(spark, table, $"id" === 3L)
    HudiExport.exportHudiTimeline(spark, table)
    assert(HudiRead.read(spark, table).select($"id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 4L, 5L))
  }
}
