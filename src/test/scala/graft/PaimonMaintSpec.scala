package graft

import org.apache.spark.sql.functions._

import graft.sources.PaimonRead

/** Paimon system tables (the reference reads them through the paimon
  * connector: PaimonMetadata.java:90 SnapshotsTable, :613 system-table
  * routing) and snapshot expiration maintenance. */
class PaimonMaintSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_pm_$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  test("system tables: snapshots, schemas, files, manifests, options") {
    val dir = fresh("sys")
    PaimonRead.commitPk(spark.range(0, 90).select($"id".as("k"),
      ($"id" % 3).cast("int").as("p"), $"id".cast("double").as("x")),
      dir, Seq("k"), partitionKeys = Seq("p"), numBuckets = 2,
      options = Map("custom.opt" -> "7"))
    PaimonRead.commitPk(spark.range(0, 30).select($"id".as("k"),
      ($"id" % 3).cast("int").as("p"), lit(-1.0).as("x")), dir, Seq("k"),
      assumeKeyUnique = true)
    PaimonRead.compact(spark, dir)

    val snaps = PaimonRead.systemTable(spark, dir, "snapshots")
      .orderBy($"snapshot_id").collect()
    assert(snaps.map(r => (r.getAs[Long]("snapshot_id"),
      r.getAs[String]("commit_kind"), r.getAs[Long]("delta_record_count")))
      .toSeq === Seq((1L, "APPEND", 90L), (2L, "APPEND", 30L),
        (3L, "COMPACT", 90L)))

    val schemas = PaimonRead.systemTable(spark, dir, "schemas").collect()
    assert(schemas.length === 1)
    assert(schemas.head.getAs[String]("primary_keys").contains("\"k\""))
    assert(schemas.head.getAs[String]("options").contains("\"custom.opt\":\"7\""))

    val files = PaimonRead.systemTable(spark, dir, "files")
    assert(files.agg(sum($"row_count")).head.getLong(0) === 90L)
    // post-compact: one max-level file per (partition, bucket)
    assert(files.select($"level").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(1))
    assert(files.count() === 6) // 3 partitions x 2 buckets

    val manifests = PaimonRead.systemTable(spark, dir, "manifests")
    assert(manifests.count() >= 3)

    val opts = PaimonRead.systemTable(spark, dir, "options").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(opts("custom.opt") === "7")
    assert(opts("bucket") === "2")

    intercept[IllegalArgumentException] {
      PaimonRead.systemTable(spark, dir, "nope")
    }
  }

  test("expireSnapshots: old metadata and unreachable files die, retained reads unchanged") {
    val dir = fresh("exp")
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def countFiles(sub: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      if (f.exists(p)) f.listStatus(p).length else 0
    }
    PaimonRead.commitPk(spark.range(0, 100).select($"id".as("k"),
      $"id".cast("double").as("x")), dir, Seq("k"), numBuckets = 2)
    PaimonRead.commitPk(spark.range(0, 40).select($"id".as("k"),
      lit(0.5).as("x")), dir, Seq("k"), assumeKeyUnique = true)
    PaimonRead.commitPk(spark.range(100, 120).select($"id".as("k"),
      $"id".cast("double").as("x")), dir, Seq("k"), assumeKeyUnique = true)
    PaimonRead.compact(spark, dir) // s4 retires the s1-s3 runs
    PaimonRead.deleteWhereDv(spark, dir, $"k" >= 110) // s5 with DVs
    val before = PaimonRead.read(spark, dir).orderBy($"k").collect()
    val manifestsBefore = countFiles("manifest")

    val expired = PaimonRead.expireSnapshots(spark, dir, retainLast = 2)
    assert(expired === Seq(1L, 2L, 3L))
    // expired ids refuse; retained read is bit-identical
    intercept[IllegalArgumentException] {
      PaimonRead.read(spark, dir, Some(2L))
    }
    assert(PaimonRead.read(spark, dir, Some(4L)).count() === 120)
    assert(PaimonRead.read(spark, dir).orderBy($"k").collect().toSeq ===
      before.toSeq)
    // the pre-compaction runs (retired at s4, unreachable from s4/s5)
    // are physically gone: every surviving bucket file is a compacted
    // data-* run, and manifest/ shrank
    assert(countFiles("manifest") < manifestsBefore)
    val buckets = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("bucket-"))
    val dataFiles = buckets.flatMap(b =>
      f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$b"))
        .map(_.getPath.getName))
    assert(dataFiles.forall(_.startsWith("data-00004")),
      s"pre-compaction runs survived expire: ${dataFiles.mkString(",")}")
    // idempotent; retaining more than exist is a no-op
    assert(PaimonRead.expireSnapshots(spark, dir, retainLast = 2) === Nil)
    // the DV index files survive (s5 references them — one per
    // touched bucket, and keys >= 110 hash into both buckets)
    assert(countFiles("index") === 2)
    assert(PaimonRead.read(spark, dir).count() === 110)
  }
}
