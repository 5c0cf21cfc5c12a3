package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query cache — per-partition intermediate-aggregation reuse
  * (reference: `be/src/exec/query_cache/cache_operator.cpp`,
  * `docs/en/using_starrocks/caching/query_cache.md`).
  *
  * The reference caches the PARTIAL aggregation each tablet produces,
  * keyed by (semantic plan digest, tablet, partition version), and
  * splits a query's partition-range predicate so overlapping ranges
  * reuse each other's per-partition partials ("predicate-based query
  * splitting"). This is the same idea re-expressed over a
  * dir-partitioned table:
  *
  *  - cache unit  = one source partition's partial aggregate
  *    (group cols + mergeable partial columns), stored as parquet
  *    under `cache/<digest>/p=<value>/v=<versionHash>/`;
  *  - digest      = sha-256 of the normalized aggregation spec
  *    (source identity + sorted group cols + sorted agg specs), so
  *    column order never splits the cache — the reference's
  *    "semantic equivalence after rearranging output columns";
  *  - version     = hash of the partition dir's (name, length,
  *    mtime) file stats — appending a file to ONE partition
  *    invalidates only that partition's entry;
  *  - reuse       = a query whose range predicate covers partitions
  *    {p3..p8} merges cached partials for whatever overlaps an
  *    earlier {p1..p5} query and computes only the rest.
  *
  * Aggregates are restricted to the mergeable core (count / sum /
  * min / max / avg — avg decomposes to sum+count), exactly the class
  * the reference's cache populates per tablet before the exchange.
  *
  * Scale shape: each partial is group-cardinality rows (KBs for
  * low-cardinality GROUP BY, the reference's stated sweet spot); a
  * 100 TB append-by-time table re-aggregates only the hot partition
  * per refresh while cold partials come off the cache — the partial
  * compute itself is a normal distributed scan+agg over just that
  * partition's files. Driver work is one directory listing (the same
  * listing any Spark scan performs).
  */
object QueryCache {

  /** One requested aggregate: fn in {count, sum, min, max, avg};
    * `col` is ignored for count(*) (pass "*").
    */
  final case class AggSpec(fn: String, col: String, alias: String)

  /** Hit/miss accounting, observable by callers and tests. */
  final class Stats {
    @volatile var hits = 0
    @volatile var misses = 0
    override def toString = s"hits=$hits misses=$misses"
  }

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(24)

  /** Semantic digest of the aggregation: column order in SELECT or
    * GROUP BY does not change it (sorted), and the partition-range
    * predicate is deliberately EXCLUDED — that is what lets
    * different ranges share partials.
    */
  def digest(srcDir: String, groupCols: Seq[String], specs: Seq[AggSpec]): String =
    sha(srcDir + "|" + groupCols.sorted.mkString(",") + "|" +
      specs.map(s => s"${s.fn}(${s.col})").sorted.mkString(","))

  /** List `p=<value>` partition dirs under srcDir with a version hash
    * of each dir's file stats.
    */
  private def partitions(
      spark: SparkSession, srcDir: String, pcol: String): Seq[(String, String)] = {
    val root = new Path(srcDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(pcol + "="))
      .map { st =>
        val value = st.getPath.getName.stripPrefix(pcol + "=")
        val files = fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
          .sorted
        (value, sha(files.mkString(";")))
      }
      .sortBy(_._1)
  }

  /** Partial-aggregate columns for the spec list (avg → sum+count;
    * count(*) and count(col) both partial-count then merge by sum).
    */
  private def partialExprs(specs: Seq[AggSpec]) = specs.flatMap { s =>
    s.fn match {
      case "count" =>
        val c = if (s.col == "*") count(lit(1)) else count(col(s.col))
        Seq(c.as(s"__cnt_${s.alias}"))
      case "sum" => Seq(sum(col(s.col).cast("decimal(18,6)")).as(s"__sum_${s.alias}"))
      case "min" => Seq(min(col(s.col)).as(s"__min_${s.alias}"))
      case "max" => Seq(max(col(s.col)).as(s"__max_${s.alias}"))
      case "avg" => Seq(
        sum(col(s.col).cast("decimal(18,6)")).as(s"__sum_${s.alias}"),
        count(col(s.col)).as(s"__cnt_${s.alias}"))
      case other => throw new IllegalArgumentException(
        s"query cache supports count/sum/min/max/avg, not $other")
    }
  }

  /** Merge exprs: combine per-partition partials into finals. */
  private def mergeExprs(specs: Seq[AggSpec]) = specs.map { s =>
    s.fn match {
      case "count" => sum(col(s"__cnt_${s.alias}")).cast("bigint").as(s.alias)
      case "sum" => sum(col(s"__sum_${s.alias}")).as(s.alias)
      case "min" => min(col(s"__min_${s.alias}")).as(s.alias)
      case "max" => max(col(s"__max_${s.alias}")).as(s.alias)
      case "avg" =>
        (sum(col(s"__sum_${s.alias}")).cast("double") /
          sum(col(s"__cnt_${s.alias}")).cast("double")).as(s.alias)
    }
  }

  /** Aggregate `srcDir` (dir-partitioned on `pcol`) grouped by
    * `groupCols`, restricted to partitions with `pmin <= value <=
    * pmax` (string compare on the partition value — use
    * lexicographically ordered values like ISO dates), serving every
    * up-to-date partition partial from `cacheDir` and computing +
    * caching the rest.
    */
  def aggregate(
      spark: SparkSession,
      srcDir: String,
      pcol: String,
      groupCols: Seq[String],
      specs: Seq[AggSpec],
      pmin: Option[String],
      pmax: Option[String],
      cacheDir: String,
      stats: Stats = new Stats): DataFrame = {

    val dig = digest(srcDir, groupCols, specs)
    val wanted = partitions(spark, srcDir, pcol).filter { case (v, _) =>
      pmin.forall(v >= _) && pmax.forall(v <= _)
    }
    val fs = new Path(cacheDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val entries = wanted.map { case (value, version) =>
      val entry = new Path(s"$cacheDir/$dig/p=$value/v=$version")
      (value, entry, fs.exists(new Path(entry, "_SUCCESS")))
    }
    stats.hits += entries.count(_._3)
    stats.misses += entries.count(!_._3)
    // ALL misses fill in ONE Spark job: a multi-path scan over the
    // missing partition dirs (the partition value recovered per row
    // from the file path — `value` throughout this object is the raw
    // dir segment, so no unescaping anywhere), one partial-agg keyed
    // by (partition, group), a partitionBy staging write, then a
    // driver-metadata rename of each staged dir to its versioned
    // cache entry. A cold range over a thousand partitions costs one
    // job's wall, not a thousand driver-dispatched jobs.
    val misses = entries.filterNot(_._3)
    if (misses.nonEmpty) {
      val staged = s"$cacheDir/$dig/_stage"
      // greedy prefix anchors to the LAST /<pcol>=…/ segment, so a
      // source root that itself contains one doesn't shadow it
      val pvRe = ".*/" + java.util.regex.Pattern.quote(s"$pcol=") + "([^/]+)/"
      spark.read.parquet(misses.map(m => s"$srcDir/$pcol=${m._1}"): _*)
        .withColumn("__pv",
          regexp_extract(col("_metadata.file_path"), pvRe, 1))
        .groupBy((col("__pv") +: groupCols.map(col)): _*)
        .agg(partialExprs(specs).head, partialExprs(specs).tail: _*)
        .repartition(col("__pv")) // one file per partition entry
        .write.partitionBy("__pv").mode("overwrite").parquet(staged)
      val stagedDirs = fs.listStatus(new Path(staged)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("__pv="))
        .map(st => graft.sources.PathNames.unescapePathName(
          st.getPath.getName.stripPrefix("__pv=")) -> st.getPath).toMap
      // a _metadata.file_path rendering that differs from the listed
      // dir segment must FAIL here, not silently cache empty partials
      val unknown = stagedDirs.keySet -- misses.map(_._1).toSet
      require(unknown.isEmpty,
        s"cache staging produced unrecognized partition renderings: $unknown")
      misses.foreach { case (value, entry, _) =>
        stagedDirs.get(value).foreach { dir =>
          // drop superseded versions of this partition, then install
          val pdir = entry.getParent
          if (fs.exists(pdir)) fs.listStatus(pdir).foreach(s => fs.delete(s.getPath, true))
          fs.mkdirs(pdir)
          if (!fs.rename(dir, entry))
            throw new IllegalStateException(s"cache install failed at $entry")
          fs.create(new Path(entry, "_SUCCESS"), true).close()
        }
      }
      fs.delete(new Path(staged), true)
      // a partition dir scanning to ZERO rows stages nothing — cache
      // an empty partial so the next query hits instead of rescanning.
      // Purge superseded versions FIRST, exactly like the staged-install
      // path: a partition that churned from rows to empty would
      // otherwise leave its old version dir on disk forever
      misses.filterNot(m => stagedDirs.contains(m._1)).foreach {
        case (value, entry, _) =>
          val pdir = entry.getParent
          if (fs.exists(pdir)) fs.listStatus(pdir).foreach(s => fs.delete(s.getPath, true))
          spark.read.parquet(s"$srcDir/$pcol=$value").limit(0)
            .groupBy(groupCols.map(col): _*)
            .agg(partialExprs(specs).head, partialExprs(specs).tail: _*)
            .coalesce(1).write.mode("overwrite").parquet(entry.toString)
      }
    }

    if (entries.isEmpty) {
      // empty range: empty result with the right schema
      val schema = spark.read.parquet(srcDir).limit(0)
        .groupBy(groupCols.map(col): _*)
        .agg(partialExprs(specs).head, partialExprs(specs).tail: _*)
      schema.groupBy(groupCols.map(col): _*).agg(mergeExprs(specs).head, mergeExprs(specs).tail: _*)
    } else {
      // ONE multi-path scan over every cached partial — a union of N
      // separate relations costs O(N) analysis and N scan nodes
      spark.read.parquet(entries.map(_._2.toString): _*)
        .groupBy(groupCols.map(col): _*)
        .agg(mergeExprs(specs).head, mergeExprs(specs).tail: _*)
    }
  }
}
