package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall-clock seconds.
  *
  * Methodology (BASELINE.md): JVM + codegen warmed by one throwaway
  * query; each query then timed once, fully materialized through the
  * noop sink (a bare count() would let Catalyst prune the very
  * projections being measured). local[32], shuffle.partitions=32 —
  * the single-node stand-in for the reference's 3×16-core cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // warm-up: JVM, parquet footers, codegen cache
    run("q1_pricing_summary")
    run("q5_local_supplier_volume")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
