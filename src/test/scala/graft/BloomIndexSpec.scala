package graft

import org.apache.spark.sql.functions._

import graft.sources.{BloomIndex, Lake}

/** Manifest-level bloom file skipping (n-gram for LIKE '%s%', whole-
  * value for equality): pruning must DROP files, never rows — every
  * result is checked against the unpruned filter. */
class BloomIndexSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_bloom_$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  test("ngram index prunes files on a rare substring and loses no rows") {
    val dir = freshTable("ngram")
    val docs = table("documents").repartition(8, $"doc_id")
    Lake.write(docs, dir, Nil)
    assert(BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text")) === 8L)
    // a needle that exists in few documents: pick the first doc's first
    // 12 characters — present in >= 1 doc by construction
    val needle = docs.select(substring($"text", 1, 12)).head().getString(0)
    val pruned = BloomIndex.readWhereContains(spark, dir, "text", needle)
    val want = Lake.read(spark, dir).filter($"text".contains(needle))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val got = pruned.df.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture needle matched nothing — vacuous test")
    assert(pruned.totalFiles === 8)
    // an absent needle must prune EVERY file (no gram can be present)
    val none = BloomIndex.readWhereContains(spark, dir, "text", "zq9xv7kq9zzz")
    assert(none.keptFiles === 0 && none.df.isEmpty)
  }

  test("needle shorter than n cannot prune but stays correct") {
    val dir = freshTable("short")
    Lake.write(table("documents").repartition(4, $"doc_id"), dir, Nil)
    BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text"))
    val r = BloomIndex.readWhereContains(spark, dir, "text", "ag")
    assert(r.keptFiles === r.totalFiles)
    val want = Lake.read(spark, dir).filter($"text".contains("ag")).count()
    assert(r.df.count() === want && want > 0)
  }

  test("value bloom serves equality; CoW rewrite drops blooms conservatively; backfill re-indexes") {
    val dir = freshTable("value")
    Lake.write(table("documents").repartition(6, $"doc_id"), dir, Nil)
    BloomIndex.buildIndex(spark, dir, valueCols = Seq("lang"))
    val lang = table("documents").select($"lang").head().getString(0)
    val hit = BloomIndex.readWhereEquals(spark, dir, "lang", lang)
    val want = Lake.read(spark, dir).filter($"lang" === lang).count()
    assert(hit.df.count() === want && want > 0)
    // equality on an absent value prunes everything
    val miss = BloomIndex.readWhereEquals(spark, dir, "lang", "xx-absent")
    assert(miss.keptFiles === 0)
    // CoW delete rewrites SOME files — their blooms are dropped, so
    // they are kept at probe time (conservative), and results stay
    // correct; the rest keep their blooms by reference
    val someId = Lake.read(spark, dir).select($"doc_id").head().getLong(0)
    Lake.delete(spark, dir, col("doc_id") === someId)
    val snap = Lake.readSnapshot(spark, dir, Lake.currentVersion(spark, dir))
    val without = snap.files.count(_.blooms.isEmpty)
    assert(without >= 1, "CoW rewrite should produce at least one bloom-less file")
    assert(snap.files.exists(_.blooms.nonEmpty), "untouched files must keep blooms")
    val afterCow = BloomIndex.readWhereEquals(spark, dir, "lang", "xx-absent")
    assert(afterCow.keptFiles === without,
      "bloom-less files must survive every probe until backfilled")
    // backfill touches ONLY the bloom-less files, then pruning is full again
    assert(BloomIndex.buildIndex(spark, dir, valueCols = Seq("lang")) === without.toLong)
    assert(BloomIndex.readWhereEquals(spark, dir, "lang", "xx-absent").keptFiles === 0)
    val again = BloomIndex.readWhereEquals(spark, dir, "lang", lang)
    assert(again.df.count() === Lake.read(spark, dir).filter($"lang" === lang).count())
  }

  test("automatic pruning: pushed contains()/equality filters consult blooms via the FileIndex") {
    val dir = freshTable("auto")
    Lake.write(table("documents").repartition(8, $"doc_id"), dir, Nil)
    BloomIndex.buildIndex(spark, dir,
      ngramCols = Seq("text"), valueCols = Seq("lang"))
    // absent substring through the PLAIN read path: every file is
    // bloom-skipped at plan time — no dedicated API involved
    val (df, idx) = Lake.readIndexed(spark, dir)
    assert(df.filter($"text".contains("zq9xv7kq9zzz")).count() === 0)
    assert(idx.lastStatsSkippedFileCount === 8,
      s"expected all 8 files bloom-skipped, got ${idx.lastStatsSkippedFileCount}")
    // absent VALUE equality chosen INSIDE the min/max range so the
    // min/max stats CANNOT prune — only the value bloom can
    val minLang = Lake.read(spark, dir).agg(min($"lang")).head().getString(0)
    val fake = minLang + "~absent"
    val (df2, idx2) = Lake.readIndexed(spark, dir)
    assert(df2.filter($"lang" === fake).count() === 0)
    assert(idx2.lastStatsSkippedFileCount === 8,
      s"value bloom should skip all 8 files for an in-range absent value")
    // a PRESENT needle loses no rows through the automatic path
    val needle = table("documents").select(substring($"text", 1, 12)).head().getString(0)
    val (df3, _) = Lake.readIndexed(spark, dir)
    val got = df3.filter($"text".contains(needle)).count()
    val want = table("documents").filter($"text".contains(needle)).count()
    assert(got === want && want > 0)
    // startsWith is a substring too — prunes on an absent prefix
    val (df4, idx4) = Lake.readIndexed(spark, dir)
    assert(df4.filter($"text".startsWith("zq9xv7kq9zzz")).count() === 0)
    assert(idx4.lastStatsSkippedFileCount === 8)
  }

  test("OCC: buildIndex racing concurrent appends never loses files or rows") {
    val dir = freshTable("occ")
    Lake.write(table("documents").limit(200).repartition(4, $"doc_id"), dir, Nil)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def retrying(what: String)(body: => Unit): Unit = {
      var attempts = 0; var done = false
      while (!done) {
        attempts += 1
        require(attempts <= 60, s"$what gave up")
        try { body; done = true } catch {
          case _: java.util.ConcurrentModificationException =>
          case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("concurrent commit") =>
        }
      }
    }
    try {
      val appender = pool.submit(new Runnable {
        def run(): Unit = try {
          (0 until 4).foreach { i =>
            val batch = table("documents")
              .filter($"doc_id" >= 200 + i * 50 && $"doc_id" < 250 + i * 50)
            retrying(s"append $i")(Lake.write(batch, dir, Nil, mode = "append"))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
      val indexer = pool.submit(new Runnable {
        def run(): Unit = try {
          (0 until 4).foreach { _ =>
            retrying("buildIndex")(
              BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text")))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
      Seq(appender, indexer).foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(errors.isEmpty, s"worker failures: ${errors.toArray.mkString(";")}")
    // no append lost: exactly the 400 distinct doc_ids written
    assert(Lake.read(spark, dir).select($"doc_id").distinct().count() === 400)
    // a final backfill indexes whatever the races left bloom-less, and
    // pruned reads stay row-exact afterwards
    BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text"))
    val needle = table("documents").select(substring($"text", 1, 12)).head().getString(0)
    val got = BloomIndex.readWhereContains(spark, dir, "text", needle)
      .df.select($"doc_id").collect().map(_.getLong(0)).toSet
    val want = Lake.read(spark, dir).filter($"text".contains(needle))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want && want.nonEmpty)
  }

  test("randomized (seeded): needles drawn from the data are never lost end to end") {
    val rnd = new scala.util.Random(1234)
    (0 until 2).foreach { round =>
      val docs = Seq.tabulate(300) { i =>
        val words = Seq.fill(rnd.nextInt(12) + 1)(
          Seq.fill(rnd.nextInt(8) + 1)(('a' + rnd.nextInt(26)).toChar).mkString)
        (i.toLong, words.mkString(" "))
      }
      val dir = freshTable(s"prop$round")
      Lake.write(docs.toDF("doc_id", "text").repartition(5, $"doc_id"), dir, Nil)
      BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text"))
      (0 until 8).foreach { _ =>
        val t = docs(rnd.nextInt(docs.size))._2
        if (t.length >= 3) {
          val start = rnd.nextInt(t.length - 2)
          val len = math.min(t.length - start, rnd.nextInt(10) + 3)
          val needle = t.substring(start, start + len)
          val got = BloomIndex.readWhereContains(spark, dir, "text", needle)
            .df.select($"doc_id").collect().map(_.getLong(0)).toSet
          val want = Lake.read(spark, dir).filter($"text".contains(needle))
            .select($"doc_id").collect().map(_.getLong(0)).toSet
          assert(got === want, s"needle '$needle' lost rows through the bloom path")
          assert(want.nonEmpty, s"needle '$needle' drawn from the data matched nothing")
        }
      }
    }
  }

  test("supplementary characters: driver grams are code-point sliced like the executor's") {
    val dir = freshTable("emoji")
    // doc 2 is findable ONLY if the driver-side probe slices grams by
    // code points — a UTF-16 substring would hash grams spanning
    // surrogate halves that the executor (Spark length/substring =
    // code points) never indexed, and the file would be pruned away
    val docs = Seq(
      (1L, "plain ascii document body"),
      (2L, "marker x🌍y🌍z endmarker"), // x🌍y🌍z
      (3L, "héllo wörld latin-1 text")).toDF("doc_id", "text")
    Lake.write(docs.repartition(3, $"doc_id"), dir, Nil)
    assert(BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text")) >= 2L)
    // needle 🌍y🌍 = 3 code points (5 UTF-16 units): exactly one gram
    val hit = BloomIndex.readWhereContains(spark, dir, "text",
      "🌍y🌍")
    assert(hit.df.select($"doc_id").collect().map(_.getLong(0)).toSet ===
      Set(2L))
    assert(hit.keptFiles < hit.totalFiles,
      "the emoji needle should prune the ascii-only files")
    // needle 🌍y = 2 code points (< n): pruning disabled, still correct
    val short = BloomIndex.readWhereContains(spark, dir, "text",
      "🌍y")
    assert(short.keptFiles === short.totalFiles)
    assert(short.df.select($"doc_id").collect().map(_.getLong(0)).toSet ===
      Set(2L))
  }

  test("buildIndex is idempotent and rejects partition/non-string columns") {
    val dir = freshTable("guards")
    Lake.write(table("documents").withColumn("bucket", pmod($"doc_id", lit(2)).cast("string"))
      .repartition(4, $"doc_id"), dir, Seq("bucket"))
    BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text"))
    assert(BloomIndex.buildIndex(spark, dir, ngramCols = Seq("text")) === 0L)
    intercept[IllegalArgumentException] {
      BloomIndex.buildIndex(spark, dir, ngramCols = Seq("bucket"))
    }
    intercept[IllegalArgumentException] {
      BloomIndex.buildIndex(spark, dir, valueCols = Seq("doc_id"))
    }
    intercept[IllegalArgumentException] {
      BloomIndex.buildIndex(spark, dir)
    }
  }
}
