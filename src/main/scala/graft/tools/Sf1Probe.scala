package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Engine, Session, SparkEntry}

/** Dev tool: one more scale decade for the worst sf0.1 growers in
  * SCALING.md — times each query at sf0.1 and at the synthesized sf1
  * ([[MakeScale]] key-offset replication, 10x the rows) and prints a
  * markdown table with the decade ratio. A healthy operator shows
  * ≤~10x (linear in data, minus the amortizing floor); super-linear
  * rows are scale bugs to fix.
  *
  * args: sf1Dir [sf01Dir]
  */
object Sf1Probe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf01 = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    Session.prepare(spark)

    // the 10 worst 100x growers from SCALING.md plus the two custom
    // operator paths worth a decade check
    val worst = Seq(
      "join_range_binned", "dedup_substring_spans", "join_interval_overlap",
      "q1_pricing_summary", "corpus_bpe_pairs", "evt_peak_concurrency",
      "text_quality_gopher", "tpcds_resale_chain", "win_partition_topn",
      "text_decontaminate", "evt_rolling_wau", "dedup_minhash")

    val lookup = SparkEntry.queries ++ graft.queries.Pipeline.benchOnly
    def time(name: String, dir: String): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        lookup(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      (run() + run()) / 2
    }

    println("| query | sf0.1 s | sf1 s | 10× data → time × |")
    println("|---|---|---|---|")
    for (name <- worst) {
      val a = time(name, sf01)
      val b = time(name, sf1)
      println(f"| $name | $a%.3f | $b%.3f | ${b / a}%.1f× |")
    }
    spark.stop()
  }
}
