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
    // Each miss is its own small Spark job (scan one partition dir,
    // partial-agg, cache write) — submitted CONCURRENTLY so a
    // cold-range query pays ~one job's wall time, not misses x floor.
    // The jobs touch disjoint partition/cache dirs, so there is no
    // shared state beyond the thread-safe scheduler.
    val misses = entries.filterNot(_._3)
    if (misses.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, misses.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val futures = misses.map { case (value, entry, _) =>
          scala.concurrent.Future {
            val partial = spark.read.parquet(s"$srcDir/$pcol=$value")
              .groupBy(groupCols.map(col): _*)
              .agg(partialExprs(specs).head, partialExprs(specs).tail: _*)
            // drop superseded versions of this partition, then cache
            val pdir = new Path(s"$cacheDir/$dig/p=$value")
            if (fs.exists(pdir)) fs.listStatus(pdir).foreach(s => fs.delete(s.getPath, true))
            partial.coalesce(1).write.mode("overwrite").parquet(entry.toString)
          }
        }
        futures.foreach(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration(10, "min")))
      } finally pool.shutdown()
    }
    val parts = entries.map { case (_, entry, _) => spark.read.parquet(entry.toString) }

    if (parts.isEmpty) {
      // empty range: empty result with the right schema
      val schema = spark.read.parquet(srcDir).limit(0)
        .groupBy(groupCols.map(col): _*)
        .agg(partialExprs(specs).head, partialExprs(specs).tail: _*)
      schema.groupBy(groupCols.map(col): _*).agg(mergeExprs(specs).head, mergeExprs(specs).tail: _*)
    } else {
      parts.reduce(_ unionByName _)
        .groupBy(groupCols.map(col): _*)
        .agg(mergeExprs(specs).head, mergeExprs(specs).tail: _*)
    }
  }
}
