package graft

import org.apache.spark.sql.functions._

import graft.sources.{BitmapIndex, Lake}

/** Per-file exact value sets (the reference's bitmap index at file
  * granularity): equality/IN pruning with ZERO false positives on
  * low-cardinality columns, overflow to always-keep past the
  * distinct cap, conservative keeps after CoW rewrites. */
class BitmapIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_bmi_$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  test("clustered low-cardinality column: equality prunes exactly, automatic path included") {
    val dir = freshTable("exact")
    val o = table("orders")
      .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
    Lake.sortKeyWrite(o, dir, Seq("o_orderpriority"), nFiles = 10)
    val nf = BitmapIndex.buildIndex(spark, dir, Seq("o_orderpriority"))
    assert(nf >= 2L)
    val snap = Lake.readSnapshot(spark, dir, Lake.currentVersion(spark, dir))
    val prio = o.select($"o_orderpriority").distinct()
      .orderBy($"o_orderpriority").head.getString(0)
    // dedicated API: kept files = exactly the files carrying the value
    val pr = BitmapIndex.readWhereEquals(spark, dir, "o_orderpriority", prio)
    val want = o.filter($"o_orderpriority" === prio).count()
    assert(pr.df.count() === want && want > 0)
    assert(pr.keptFiles < pr.totalFiles,
      s"clustered write should localize $prio to a file subset")
    // EXACTNESS: every kept file really contains the value (the bloom
    // index can false-positive; the bitmap set cannot)
    val carrying = snap.files.count(lf =>
      spark.read.parquet(lf.path)
        .filter($"o_orderpriority" === prio).limit(1).count() > 0)
    assert(pr.keptFiles === carrying, "bitmap prune kept a file without the value")
    // automatic path: a pushed equality consults the sets via the
    // FileIndex; min/max stats alone cannot skip an IN-RANGE absent
    // value, the set can
    val (df, idx) = Lake.readIndexed(spark, dir)
    assert(df.filter($"o_orderpriority" === (prio + "~absent")).count() === 0)
    assert(idx.lastStatsSkippedFileCount === nf.toInt,
      s"absent in-range value should skip all files, skipped ${idx.lastStatsSkippedFileCount}")
    // IN-list keeps the union of the element's file sets
    val prios = o.select($"o_orderpriority").distinct()
      .orderBy($"o_orderpriority").collect().map(_.getString(0)).take(2).toSeq
    val (df2, idx2) = Lake.readIndexed(spark, dir)
    val gotIn = df2.filter($"o_orderpriority".isin(prios: _*)).count()
    assert(gotIn === o.filter($"o_orderpriority".isin(prios: _*)).count())
    assert(idx2.lastStatsSkippedFileCount > 0, "IN over two values should still skip files")
  }

  test("numeric and boolean columns prune; overflow column always keeps") {
    val dir = freshTable("types")
    val df = spark.range(0, 2000).select(
      ($"id" % 4).cast("int").as("bucket"),
      ($"id" % 2 === 0).as("flag"),
      $"id".as("uid"))
    Lake.sortKeyWrite(df, dir, Seq("bucket"), nFiles = 8)
    // uid: 2000 distinct over cap 64 -> overflow marker
    assert(BitmapIndex.buildIndex(spark, dir, Seq("bucket", "flag", "uid")) >= 2L)
    val pr = BitmapIndex.readWhereEquals(spark, dir, "bucket", "2")
    assert(pr.df.count() === 500 && pr.keptFiles < pr.totalFiles)
    // absent numeric value prunes everything
    assert(BitmapIndex.readWhereEquals(spark, dir, "bucket", "9").keptFiles === 0)
    // boolean renders true/false
    val pf = BitmapIndex.readWhereEquals(spark, dir, "flag", "true")
    assert(pf.df.count() === 1000)
    // overflow column must never prune — always kept, still correct
    val po = BitmapIndex.readWhereEquals(spark, dir, "uid", "77")
    assert(po.keptFiles === po.totalFiles)
    assert(po.df.count() === 1)
    // automatic path for a long equality on the overflow column stays
    // correct (min/max stats may prune, the set never mis-prunes)
    val (d2, _) = Lake.readIndexed(spark, dir)
    assert(d2.filter($"uid" === 77L).count() === 1)
  }

  test("CoW rewrite drops entries conservatively; backfill reindexes only the missing files") {
    val dir = freshTable("cow")
    val df = spark.range(0, 1000).select(($"id" % 5).cast("int").as("g"), $"id".as("k"))
    Lake.sortKeyWrite(df, dir, Seq("g"), nFiles = 5)
    BitmapIndex.buildIndex(spark, dir, Seq("g"))
    assert(BitmapIndex.buildIndex(spark, dir, Seq("g")) === 0L, "idempotent")
    // rewrite ONE file's rows: its entry drops, file kept conservatively
    Lake.delete(spark, dir, $"g" === 2 && $"k" % 7 === 0)
    val snap = Lake.readSnapshot(spark, dir, Lake.currentVersion(spark, dir))
    val missing = snap.files.count(lf => !lf.blooms.contains("bv:g"))
    assert(missing >= 1, "CoW rewrite should shed the file's index entry")
    val pr = BitmapIndex.readWhereEquals(spark, dir, "g", "2")
    assert(pr.df.count() === df.filter($"g" === 2 && !($"k" % 7 === 0)).count())
    // backfill touches exactly the shed files
    assert(BitmapIndex.buildIndex(spark, dir, Seq("g")) === missing.toLong)
    val pr2 = BitmapIndex.readWhereEquals(spark, dir, "g", "2")
    assert(pr2.keptFiles < pr2.totalFiles)
    // guards: partition col / unknown / unstable types refused
    val pdir = freshTable("guards")
    Lake.write(df.withColumn("p", ($"g" % 2).cast("string")), pdir, Seq("p"))
    intercept[IllegalArgumentException] {
      BitmapIndex.buildIndex(spark, pdir, Seq("p"))
    }
    intercept[IllegalArgumentException] {
      BitmapIndex.buildIndex(spark, pdir, Seq("nope"))
    }
  }

  test("table path with URL-special characters: index keys match, no silent empty sets") {
    // '+' decodes to ' ' under URLDecoder — pre-fix the build keyed
    // byFile with a decode the lookup lacked, so every file missed and
    // committed an EMPTY value set: each equality probe then pruned
    // ALL files and returned zero rows
    val base = java.nio.file.Files.createTempDirectory("graft_bmi_enc").toFile
    val dir = new java.io.File(base, "a+b %41").getAbsolutePath
    val df = spark.range(0, 500).select(($"id" % 4).cast("int").as("g"), $"id".as("k"))
    Lake.sortKeyWrite(df, dir, Seq("g"), nFiles = 4)
    BitmapIndex.buildIndex(spark, dir, Seq("g"))
    val snap = Lake.readSnapshot(spark, dir, Lake.currentVersion(spark, dir))
    // every indexed entry is NON-empty (the data has no all-null file)
    snap.files.foreach(lf =>
      assert(lf.blooms.get("bv:g").exists(_.nonEmpty),
        s"empty bitmap set committed for ${lf.path}"))
    val pr = BitmapIndex.readWhereEquals(spark, dir, "g", "2")
    assert(pr.df.count() === df.filter($"g" === 2).count())
    assert(pr.keptFiles > 0 && pr.keptFiles < pr.totalFiles)
  }
}
