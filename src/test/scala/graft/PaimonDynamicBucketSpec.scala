package graft

import graft.sources.{PaimonDv, PaimonHashIndex, PaimonRead}
import org.apache.spark.sql.functions.{col, hash, lit}

/** Dynamic-bucket ('bucket' = '-1') PK tables: sticky HASH-index
  * routing, target-row bucket fill, index survival across compaction,
  * CDC feed equality with a fixed-bucket twin, and the touched-bucket
  * prior pruning staying valid. */
class PaimonDynamicBucketSpec extends SparkSuite {
  import spark.implicits._

  private def fresh(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-dyn-$tag").toString + "/t"

  private def batch(ids: Seq[Long], x: Double) =
    ids.toDF("k").withColumn("x", lit(x) + col("k"))

  test("sticky assignment: buckets fill to target, existing keys keep their bucket, index manifest is full-state") {
    val dir = fresh("sticky")
    PaimonRead.commitPk(batch(0L until 20L, 0.0), dir, Seq("k"),
      numBuckets = -1,
      options = Map("dynamic-bucket.target-row-num" -> "8"))
    // 20 new keys at target 8 -> buckets 0 (8), 1 (8), 2 (4)
    val im1 = PaimonRead.snapshotIndexManifest(spark, dir, 1L)
    assert(im1.nonEmpty)
    val idx1 = PaimonHashIndex.entriesAt(spark, dir, im1)
    assert(idx1.map(e => e.bucket -> e.rowCount).sortBy(_._1) ===
      Seq(0 -> 8L, 1 -> 8L, 2 -> 4L))
    assert(PaimonRead.read(spark, dir).count() === 20)
    // key -> hash -> bucket, through the same Spark murmur the writer used
    val keyHash = (0L until 20L).toDF("k")
      .select(col("k"), hash(col("k")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def bucketOf(im: Option[String]): Map[Int, Int] =
      PaimonHashIndex.entriesAt(spark, dir, im).flatMap { e =>
        PaimonHashIndex.readHashFile(f,
            new org.apache.hadoop.fs.Path(s"$dir/index/${e.fileName}"))
          .map(_ -> e.bucket)
      }.toMap
    val assign1 = bucketOf(im1)
    assert(assign1.size === 20)
    // commit 2: update 5 existing keys + 3 new -> existing keys stay
    // in their buckets, new keys continue filling bucket 2
    PaimonRead.commitPk(batch(Seq(0L, 3L, 7L, 11L, 19L) ++ (20L until 23L),
      100.0), dir, Seq("k"), assumeKeyUnique = true)
    val im2 = PaimonRead.snapshotIndexManifest(spark, dir, 2L)
    val assign2 = bucketOf(im2)
    assert(assign2.size === 23)
    assign1.foreach { case (h, b) => assert(assign2(h) === b) }
    val idx2 = PaimonHashIndex.entriesAt(spark, dir, im2)
    assert(idx2.map(e => e.bucket -> e.rowCount).sortBy(_._1) ===
      Seq(0 -> 8L, 1 -> 8L, 2 -> 7L))
    // the commit's data files landed in the keys' assigned buckets
    val adds2 = PaimonRead.liveFiles(spark, dir, Some(2L))
      .filter(_.minSeq == 2L)
    val expectedBuckets = (Seq(0L, 3L, 7L, 11L, 19L) ++ (20L until 23L))
      .map(k => assign2(keyHash.getOrElse(k,
        Seq(k).toDF("k").select(hash(col("k"))).head().getInt(0)))).toSet
    assert(adds2.map(_.bucket).toSet === expectedBuckets)
    // merged read resolves to the latest images
    val got = PaimonRead.read(spark, dir).orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length === 23)
    assert(got.filter(x => Seq(0L, 3L, 7L, 11L, 19L).contains(x._1))
      .forall { case (k, x) => x === 100.0 + k })
    assert(got.find(_._1 === 1L).get._2 === 1.0)
  }

  test("CDC: feed bit-equal to a fixed-bucket twin; prior set pruned to touched buckets") {
    val dirD = fresh("cdc-dyn"); val dirF = fresh("cdc-fix")
    def feed(dir: String, buckets: Int) = {
      PaimonRead.commitPk(batch(0L until 16L, 0.0), dir, Seq("k"),
        numBuckets = buckets,
        options = Map("dynamic-bucket.target-row-num" -> "6"))
      PaimonRead.commitPk(batch(Seq(2L, 9L), 50.0), dir, Seq("k"),
        assumeKeyUnique = true)
      PaimonRead.commitPk(Seq(4L).toDF("k"), dir, Seq("k"),
        deletes = true, assumeKeyUnique = true)
      PaimonRead.changes(spark, dir, 1L, 3L)
        .select($"k", $"x", $"__change_type", $"__commit_version")
        .orderBy($"__commit_version", $"__change_type", $"k")
        .collect().toSeq
    }
    val dyn = feed(dirD, -1)
    val fix = feed(dirF, 4)
    assert(dyn === fix) // rows identical, bucketing invisible to the feed
    // pruning: commit 2 touched keys 2 and 9 — the prior live set
    // restricts to THEIR buckets, not all three
    val prior = PaimonRead.liveFiles(spark, dirD, Some(1L))
    assert(prior.map(_.bucket).toSet === Set(0, 1, 2)) // 16 keys / target 6
    val adds2 = PaimonRead.liveFiles(spark, dirD, Some(2L))
      .filter(_.minSeq == 2L)
    val pruned = PaimonRead.prunePriorToTouchedBuckets(prior, adds2)
    assert(pruned.size < prior.size,
      s"expected pruning, got ${pruned.size}/${prior.size}")
    assert(pruned.map(_.bucket).toSet === adds2.map(_.bucket).toSet)
  }

  test("compaction keeps the HASH index; assignments stay sticky after it") {
    val dir = fresh("compact")
    PaimonRead.commitPk(batch(0L until 12L, 0.0), dir, Seq("k"),
      numBuckets = -1,
      options = Map("dynamic-bucket.target-row-num" -> "5"))
    PaimonRead.commitPk(batch(Seq(1L, 6L), 10.0), dir, Seq("k"),
      assumeKeyUnique = true)
    val before = PaimonRead.snapshotIndexManifest(spark, dir, 2L)
    val assignBefore = PaimonHashIndex.entriesAt(spark, dir, before)
      .map(e => e.bucket -> e.rowCount).sortBy(_._1)
    val cid = PaimonRead.compact(spark, dir)
    val after = PaimonRead.snapshotIndexManifest(spark, dir, cid)
    assert(after.nonEmpty, "compaction dropped the hash index")
    assert(PaimonHashIndex.entriesAt(spark, dir, after)
      .map(e => e.bucket -> e.rowCount).sortBy(_._1) === assignBefore)
    // post-compaction update stays in the key's bucket and merges
    PaimonRead.commitPk(batch(Seq(6L), 99.0), dir, Seq("k"),
      assumeKeyUnique = true)
    val got = PaimonRead.read(spark, dir).filter($"k" === 6L).collect()
    assert(got.length === 1 && got.head.getDouble(1) === 105.0)
    assert(PaimonRead.read(spark, dir).count() === 12)
    // the one-key commit touched ONE bucket; prior prunes to it
    val prior = PaimonRead.liveFiles(spark, dir, Some(cid))
    val adds = PaimonRead.liveFiles(spark, dir, Some(cid + 1))
      .filter(_.minSeq == cid + 1)
    assert(adds.map(_.bucket).toSet.size === 1)
    val pruned = PaimonRead.prunePriorToTouchedBuckets(prior, adds)
    assert(pruned.map(_.bucket).toSet === adds.map(_.bucket).toSet)
  }
}
