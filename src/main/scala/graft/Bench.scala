package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall-clock seconds.
  *
  * Methodology matches the reference's published runs (BASELINE.md:
  * "queries warmed 1×, averaged over 3 runs",
  * docs/en/benchmarking/TPC-H_Benchmarking.md): per query, one warm-up
  * execution (codegen compile, parquet footers, AQE stats), then the
  * mean of 3 timed executions, fully materialized through the noop
  * sink (a bare count() would let Catalyst prune the very projections
  * being measured). local[32], shuffle.partitions=32 — the single-node
  * stand-in for the reference's 3×16-core cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = Engine.configure(
      SparkSession.builder().appName("graft-bench"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Session.prepare(spark)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    def warmAvg(name: String): Double = {
      if (run(name) < 0) return -1.0 // warm-up run, untimed
      val times = (1 to runsPerQuery).map(_ => run(name))
      if (times.exists(_ < 0)) -1.0 else times.sum / times.length
    }

    // global warm-up: JVM, shuffle machinery
    run("q1_pricing_summary")

    // optional arg (local dev only): comma-separated query-name filter
    val only: Option[Set[String]] = args.headOption.map(_.split(",").toSet)
    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .map(n => n -> warmAvg(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
