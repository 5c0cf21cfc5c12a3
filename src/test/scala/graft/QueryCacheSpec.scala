package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.QueryCache
import graft.operators.QueryCache.AggSpec

/** Query cache semantics (reference be/src/exec/query_cache/):
  * per-partition partial reuse, predicate-based splitting across
  * overlapping ranges, version-keyed invalidation of exactly the
  * mutated partition, and digest invariance to column order.
  */
class QueryCacheSpec extends SparkSuite {

  private val specs = Seq(
    AggSpec("count", "*", "n"),
    AggSpec("sum", "value", "total"),
    AggSpec("avg", "value", "avg_value"),
    AggSpec("min", "value", "lo"),
    AggSpec("max", "value", "hi"))

  private def setup(): (String, String) = {
    val root = Files.createTempDirectory("graft-qc").toString
    table("events")
      .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("d").parquet(s"$root/base")
    (s"$root/base", s"$root/cache")
  }

  private def run(base: String, cache: String, lo: String, hi: String,
      stats: QueryCache.Stats) =
    QueryCache.aggregate(spark, base, "d", Seq("event_type"), specs,
      Some(lo), Some(hi), cache, stats)

  test("cold run misses every partition; identical rerun is all hits") {
    val (base, cache) = setup()
    val s1 = new QueryCache.Stats
    run(base, cache, "2024-01-03", "2024-01-07", s1).count()
    assert(s1.misses === 5 && s1.hits === 0)
    val s2 = new QueryCache.Stats
    run(base, cache, "2024-01-03", "2024-01-07", s2).count()
    assert(s2.hits === 5 && s2.misses === 0)
  }

  test("overlapping range reuses only the overlap (predicate split)") {
    val (base, cache) = setup()
    run(base, cache, "2024-01-03", "2024-01-07", new QueryCache.Stats).count()
    val s = new QueryCache.Stats
    run(base, cache, "2024-01-05", "2024-01-10", s).count()
    assert(s.hits === 3 && s.misses === 3) // 05,06,07 cached; 08,09,10 new
  }

  test("cached merge equals the direct uncached aggregate") {
    val (base, cache) = setup()
    run(base, cache, "2024-01-01", "2024-01-10", new QueryCache.Stats).count()
    val cached = run(base, cache, "2024-01-01", "2024-01-10", new QueryCache.Stats)
      .orderBy("event_type").collect().toSeq
    val direct = table("events")
      .where(col("ts").cast("date").between("2024-01-01", "2024-01-10"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(col("value")).cast("double")).as("avg_value"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      .orderBy("event_type").collect().toSeq
    assert(cached === direct)
  }

  test("appending to one partition invalidates only that partition") {
    val (base, cache) = setup()
    run(base, cache, "2024-01-02", "2024-01-06", new QueryCache.Stats).count()
    // mutate exactly 2024-01-04
    table("events")
      .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
      .where(col("d") === "2024-01-04").limit(10)
      .write.mode("append").partitionBy("d").parquet(base)
    val s = new QueryCache.Stats
    val out = run(base, cache, "2024-01-02", "2024-01-06", s)
    assert(s.misses === 1 && s.hits === 4)
    // and the refreshed result actually includes the appended rows
    val total = out.agg(sum("n")).head.getLong(0)
    val expect = spark.read.parquet(base)
      .where(col("d").between("2024-01-02", "2024-01-06")).count()
    assert(total === expect)
  }

  test("digest ignores column order (semantic equivalence)") {
    val a = QueryCache.digest("/t", Seq("x", "y"), specs)
    val b = QueryCache.digest("/t", Seq("y", "x"), specs.reverse)
    assert(a === b)
    val c = QueryCache.digest("/t", Seq("x"), specs)
    assert(a !== c)
  }

  test("empty partition range yields empty result, no cache writes") {
    val (base, cache) = setup()
    val s = new QueryCache.Stats
    val out = run(base, cache, "2030-01-01", "2030-12-31", s)
    assert(out.count() === 0 && s.hits === 0 && s.misses === 0)
  }
}
