package graft

import graft.sources.DeltaRead

/** Delta-protocol log replay: adds, tombstones, time travel, and
  * rejection of non-delta directories. */
class DeltaReadSpec extends SparkSuite {
  import spark.implicits._

  test("log replay: adds, tombstones, time travel") {
    val table = java.nio.file.Files.createTempDirectory("graft-delta").toString
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((3L, "z")).toDF("id", "v")
    assert(DeltaRead.commit(a.coalesce(1), table) === 0L)
    assert(DeltaRead.commit(b.coalesce(1), table) === 1L)
    assert(DeltaRead.read(spark, table).count() === 3)
    assert(DeltaRead.read(spark, table, Some(0L)).count() === 2)
    // tombstone commit 0's files; only commit 1's rows survive
    val v0 = DeltaRead.liveFiles(spark, table, Some(0L))
    DeltaRead.commit(a.limit(0).coalesce(1), table, removePaths = v0)
    val latest = DeltaRead.read(spark, table).select($"id").collect().map(_.getLong(0))
    assert(latest.toSet === Set(3L))
    assert(DeltaRead.versions(spark, table) === Seq(0L, 1L, 2L))
    intercept[IllegalArgumentException] {
      DeltaRead.versions(spark, java.nio.file.Files.createTempDirectory("nd").toString)
    }
  }
}
