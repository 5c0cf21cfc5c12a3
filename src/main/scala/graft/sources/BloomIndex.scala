package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Lake.{LakeFile, Snapshot}

/** Secondary-index file skipping for Lake tables — the reference's
  * NGRAM bloom filter index (`docs/en/table_design/indexes/
  * Ngram_Bloom_Filter_Index.md`, accelerates `LIKE '%s%'`) and plain
  * BLOOMFILTER index (`Bloomfilter_index.md`, point equality on
  * high-cardinality unsorted columns), re-expressed at MANIFEST
  * granularity: one bloom per (file, column) stored in the Lake
  * snapshot, consulted at plan time to drop whole files before any
  * byte is read. Per-segment indexes don't map to Spark (the scan unit
  * is the file); per-file blooms give the same I/O story — a substring
  * scan over 100 TB of documents reads only the files whose 3-gram
  * bloom admits every gram of the needle.
  *
  * Design points:
  *  - blooms live in the manifest (KBs per file), so pruning needs no
  *    extra I/O beyond the snapshot read the planner already does;
  *  - hashing is Spark's `xxhash64` (seed 42) — the SAME Catalyst
  *    expression evaluates driver-side at prune time, so build and
  *    probe can never drift;
  *  - a file WITHOUT a bloom is always kept (conservative): CoW
  *    rewrites drop blooms on rewritten files only, and
  *    [[buildIndex]] backfills exactly the files missing entries;
  *  - correctness never depends on the bloom — the pruned read
  *    re-applies the full predicate to surviving rows, so a false
  *    positive costs I/O, never wrong rows.
  */
object BloomIndex {

  /** Blocked bloom over `1 << bitsLog2` bits with `k` probe positions
    * derived from one 64-bit hash by double hashing. */
  final class Bloom(val bits: Array[Long], val k: Int) {
    def m: Int = bits.length * 64
    private def positions(h: Long): Seq[Int] = {
      val h2 = (h >>> 33) * 2 + 1 // odd => full-period stride
      (0 until k).map(i => java.lang.Math.floorMod(h + i * h2, m.toLong).toInt)
    }
    def add(h: Long): Unit =
      positions(h).foreach(p => bits(p >> 6) |= (1L << (p & 63)))
    def setBit(p: Int): Unit = bits(p >> 6) |= (1L << (p & 63))
    def mightContain(h: Long): Boolean =
      positions(h).forall(p => (bits(p >> 6) & (1L << (p & 63))) != 0)
    def toBase64: String = {
      val bb = java.nio.ByteBuffer.allocate(1 + bits.length * 8)
      bb.put(k.toByte); bits.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
  }

  object Bloom {
    def empty(bitsLog2: Int, k: Int): Bloom =
      new Bloom(new Array[Long]((1 << bitsLog2) / 64), k)
    def fromBase64(s: String): Bloom = {
      val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(s))
      val k = bb.get().toInt
      val bits = Array.fill(bb.remaining() / 8)(bb.getLong)
      new Bloom(bits, k)
    }
  }

  /** Driver-side xxhash64 of a string — the IDENTICAL Catalyst
    * expression the build pipeline runs on executors. */
  private def hash(s: String): Long =
    XxHash64(Seq(Literal(UTF8String.fromString(s), StringType)), 42L)
      .eval(null).asInstanceOf[Long]

  /** Case-sensitive character n-grams (the reference's default;
    * gram_num rows shorter than n contribute nothing and are only
    * reachable by a needle shorter than n, which disables pruning).
    *
    * Counts and slices by Unicode CODE POINTS, not UTF-16 units — the
    * executor build pipeline uses Spark `length`/`substring`, which
    * are code-point based, so a UTF-16 `String.substring` here would
    * hash grams that were never indexed for supplementary characters
    * (emoji etc.) and turn bloom pruning into silent row loss. */
  private[sources] def grams(s: String, n: Int): Seq[String] = {
    if (s == null) return Seq.empty
    val cpLen = s.codePointCount(0, s.length)
    if (cpLen < n) Seq.empty
    else {
      val b = Seq.newBuilder[String]
      var start = 0 // UTF-16 offset of gram's first code point
      var i = 0
      while (i <= cpLen - n) {
        val end = s.offsetByCodePoints(start, n)
        b += s.substring(start, end)
        start = s.offsetByCodePoints(start, 1)
        i += 1
      }
      b.result()
    }
  }
  private def ngramKey(col: String, n: Int) = s"ng$n:$col"
  private def valueKey(col: String) = s"val:$col"
  private val NgKey = "^ng(\\d+):(.*)$".r

  // The pruner calls the probe helpers once per FILE per predicate —
  // 10k-file table => 10k calls with the same needle and a few
  // thousand distinct base64 strings. Bounded memo maps keep the gram
  // hashing O(1 per needle) and the base64 decode O(1 per distinct
  // bloom); cleared wholesale at the cap (planner-driven working sets
  // are small — the cap only guards pathological churn).
  private val gramHashCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[Long]]()
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, Bloom]()
  private def gramHashes(needle: String, n: Int): Seq[Long] = {
    if (gramHashCache.size > 4096) gramHashCache.clear()
    gramHashCache.computeIfAbsent((needle, n),
      _ => grams(needle, n).map(hash))
  }
  private def decoded(b64: String): Bloom = {
    if (bloomCache.size > 4096) bloomCache.clear()
    bloomCache.computeIfAbsent(b64, Bloom.fromBase64)
  }

  /** Probe helpers for [[Lake.LakeFileIndex]]'s automatic pruner —
    * `Lake.read(...).filter($"text".contains("x"))` consults these for
    * every pushed Contains/StartsWith/EndsWith/string-equality filter,
    * so bloom skipping needs no dedicated read API. A file without the
    * relevant bloom, or a needle shorter than the gram size, keeps the
    * file (conservative). */
  private[sources] def mayContainSubstring(blooms: Map[String, String],
      c: String, needle: String): Boolean =
    blooms.collectFirst {
      case (NgKey(nStr, col), b64) if col == c =>
        val hs = gramHashes(needle, nStr.toInt)
        hs.isEmpty || { val b = decoded(b64); hs.forall(b.mightContain) }
    }.getOrElse(true)

  private[sources] def mayContainValue(blooms: Map[String, String],
      c: String, value: String): Boolean =
    blooms.get(valueKey(c))
      .forall(b64 => decoded(b64).mightContain(hash(value)))

  /** Build (or BACKFILL) per-file blooms for `ngramCols` (3-gram by
    * default — serves substring predicates) and/or `valueCols` (whole
    * value — serves equality) on the CURRENT snapshot, committing a
    * new version with the same data files plus the bloom entries.
    * Only files MISSING one of the requested keys are read — the
    * incremental-maintenance shape: after a CoW rewrite dropped some
    * files' blooms, the backfill scans just those files. Indexed
    * columns must be string-typed DATA columns (not partition
    * columns). Returns the number of files (re)indexed. */
  def buildIndex(spark: SparkSession, table: String,
      ngramCols: Seq[String] = Seq.empty, valueCols: Seq[String] = Seq.empty,
      n: Int = 3, bitsLog2: Int = 15, k: Int = 4): Long = {
    require(ngramCols.nonEmpty || valueCols.nonEmpty, "no columns to index")
    val v = Lake.currentVersion(spark, table)
    require(v > 0, s"no committed version at $table")
    val snap = Lake.readSnapshot(spark, table, v)
    (ngramCols ++ valueCols).foreach { c =>
      require(!snap.partitionCols.contains(c),
        s"$c is a partition column — partition pruning already serves it")
      require(snap.schema.fields.exists(f =>
          f.name == c && f.dataType == StringType),
        s"$c must be a STRING data column of $table")
    }
    val wanted: Seq[String] =
      ngramCols.map(ngramKey(_, n)) ++ valueCols.map(valueKey)
    val todo = snap.files.filterNot(f => wanted.forall(f.blooms.contains))
    if (todo.isEmpty) return 0L

    val m = 1 << bitsLog2
    // one pass over just the un-indexed files: explode to (file, key,
    // bit position), distinct per file — the aggregate is bounded by
    // m distinct positions per (file, key), map-side combined
    val raw = spark.read.schema(snap.schema)
      .parquet(todo.map(_.path): _*)
      .withColumn("__f", input_file_name())
    val posFor: (String, String) => DataFrame = (c, key) => {
      // rows that can't contribute are FILTERED, not sequenced to an
      // empty range: sequence(1, 0) defaults to step -1 and yields
      // [1, 0] — two junk grams per short row and a build/probe gram
      // definition mismatch (driver grams() emits nothing for them)
      val (src, gramsCol) =
        if (key.startsWith("val:"))
          (raw.filter(col(c).isNotNull), array(col(c)))
        else
          (raw.filter(length(col(c)) >= n),
            expr(s"transform(sequence(1, length($c) - ${n - 1}), " +
              s"i -> substring($c, i, $n))"))
      src.select(col("__f"), explode(gramsCol).as("__g"))
        .select(col("__f"), lit(key).as("__k"),
          explode(expr(s"transform(sequence(0, ${k - 1}), i -> " +
            s"cast(pmod(xxhash64(__g) + i * (shiftrightunsigned(xxhash64(__g), 33) * 2 + 1), ${m}L) as int))"))
            .as("__p"))
    }
    // pack bits EXECUTOR-side: the driver receives one (file, key,
    // base64) row per bloom — KBs each, manifest-scale in count — not
    // the raw positions (128 KB per bloom at the default m). Inline
    // manifest blooms are the right trade to ~10k files per table;
    // past that a table format shards index blobs into sidecars
    // (Iceberg puffin) — out of scope here and noted in COVERAGE.
    import spark.implicits._
    val packed = (ngramCols.map(c => posFor(c, ngramKey(c, n))) ++
        valueCols.map(c => posFor(c, valueKey(c))))
      .reduce(_ union _)
      .distinct()
      .groupBy(col("__f"), col("__k"))
      .agg(collect_set(col("__p")).as("__ps"))
      .as[(String, String, Array[Int])]
      .map { case (f, key, ps) =>
        val b = Bloom.empty(bitsLog2, k)
        ps.foreach(b.setBit)
        (f, key, b.toBase64)
      }
      .collect()
    // normalize path comparison: input_file_name returns a URI
    // (file:///…, PERCENT-ENCODED); manifest paths are raw FileStatus
    // strings (file:/…). Decode ONLY the input_file_name side — the
    // same idiom as Lake's CoW touched-file discovery; decoding both
    // would corrupt manifest paths legitimately containing '%'.
    val bloomed: Map[String, Map[String, String]] =
      packed.groupBy(t => java.net.URLDecoder.decode(
          new org.apache.hadoop.fs.Path(t._1).toUri.getPath, "UTF-8"))
        .map { case (f, rows) => f -> rows.map(t => t._2 -> t._3).toMap }
    val todoPaths = todo.map(_.path).toSet
    val updated = snap.files.map { lf =>
      if (!todoPaths(lf.path)) lf
      else {
        val built = bloomed.getOrElse(
          new org.apache.hadoop.fs.Path(lf.path).toUri.getPath, Map.empty)
        // every WANTED key gets an entry, per key: the built bloom, or
        // an EMPTY one when the column yielded zero positions in this
        // file (all rows null / shorter than n — prunes every probe).
        // A partial attach would re-select the file on every future
        // buildIndex call and never install the empty bloom.
        lf.copy(blooms = lf.blooms ++ wanted.map(w =>
          w -> built.getOrElse(w, Bloom.empty(bitsLog2, k).toBase64)).toMap)
      }
    }
    Lake.commitAmended(spark, table, snap.copy(files = updated))
    todo.size.toLong
  }

  /** The result of a bloom-pruned read: the DataFrame over surviving
    * files (with the predicate RE-APPLIED — false positives cost I/O,
    * never rows), plus the file counts tests/profiles assert on. */
  final case class PrunedRead(df: DataFrame, keptFiles: Int, totalFiles: Int)

  /** `col LIKE '%needle%'` through the n-gram blooms: a file survives
    * only if every n-gram of the needle might be present (or the file
    * has no bloom). Needles shorter than n cannot prune. Pruning is
    * manifest-side (the same [[mayContainSubstring]] the automatic
    * FileIndex path consults), exposed here with the file counts so
    * callers and tests can assert the skip. */
  def readWhereContains(spark: SparkSession, table: String,
      c: String, needle: String): PrunedRead = {
    val snap = Lake.readSnapshot(spark, table,
      Lake.currentVersion(spark, table))
    val kept = snap.files.filter(lf =>
      mayContainSubstring(lf.blooms, c, needle))
    val (df, _) = Lake.indexedDataFrame(spark, table, snap.copy(files = kept))
    PrunedRead(df.filter(col(c).contains(needle)), kept.size, snap.files.size)
  }

  /** Point equality through the whole-value blooms. */
  def readWhereEquals(spark: SparkSession, table: String,
      c: String, value: String): PrunedRead = {
    val snap = Lake.readSnapshot(spark, table,
      Lake.currentVersion(spark, table))
    val kept = snap.files.filter(lf => mayContainValue(lf.blooms, c, value))
    val (df, _) = Lake.indexedDataFrame(spark, table, snap.copy(files = kept))
    PrunedRead(df.filter(col(c) === value), kept.size, snap.files.size)
  }
}
