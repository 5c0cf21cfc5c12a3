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
}
