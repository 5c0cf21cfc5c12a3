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
  * args: sf1Dir [sf01Dir] [set]  — set = "worst" (default),
  * "flights" (full TPC-H 22 + SSB 13, the per-row competitiveness
  * flight with the statement floor amortized by 10x the rows),
  * "tpcds" (one representative per TPC-DS-mechanics family),
  * "cb" (every ClickBench-mechanics gate, resolved dynamically), or
  * "tail" (the sf1 flight's worst growers + the dedup/percentile
  * family — the set whose NEXT decade decides fixed-cost artifact
  * vs real super-linear term; run with sf10 as dir1, sf1 as dir2)
  */
object Sf1Probe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf01 = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val set = args.lift(2).getOrElse("worst")

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

    val flights = Seq(
      "q1_pricing_summary", "q2_best_supplier", "q3_shipping_priority",
      "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
      "q7_volume_shipping", "q8_market_share", "q9_product_profit",
      "q10_returned_items", "q11_important_parts", "q12_late_lines",
      "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
      "q16_part_supplier_count", "q17_small_quantity_revenue",
      "q18_large_volume_customer", "q19_disjunctive_revenue",
      "q20_supplier_candidates", "q21_waiting_supplier",
      "q22_sales_opportunity",
      "ssb_q1_1", "ssb_q1_2", "ssb_q1_3", "ssb_q2_1", "ssb_q2_2", "ssb_q2_3",
      "ssb_q3_1", "ssb_q3_2", "ssb_q3_3", "ssb_q3_4",
      "ssb_q4_1", "ssb_q4_2", "ssb_q4_3")

    // TPC-DS-mechanics flight: one representative per distinguishing
    // family, weighted toward the CTE-stack / self-join shapes whose
    // scaling is least like TPC-H
    val tpcds = Seq(
      "tpcds_yoy_cte_stack", "tpcds_three_channel_ratio",
      "tpcds_q64_sales_chain", "tpcds_rollup_rank_topn",
      "tpcds_wide_month_pivot", "tpcds_channel_union",
      "tpcds_moving_dev", "tpcds_cume_crossover", "tpcds_exists_stack",
      "tpcds_store_item_floor", "tpcds_class_rev_share",
      "tpcds_rollup_avg_bands", "tpcds_dim_copy_mismatch",
      "tpcds_inventory_lag", "tpcds_decline_pairs")

    // the sf1 decade's tail growers (q14 8.3x, q4/q18 4.4x, ssb_q3_3
    // 2.9x) + the dedup/percentile family: one more decade tells
    // whether these are amortizing fixed costs or super-linear terms
    val tail = Seq(
      "q4_order_priority", "q14_promo_revenue", "q18_large_volume_customer",
      "ssb_q3_3", "dedup_minhash", "dedup_semantic", "dedup_substring_spans",
      "agg_percentiles", "agg_weighted_percentile", "percentile_tdigest",
      "text_decontaminate", "evt_rolling_wau")

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
    var (sumA, sumB) = (0.0, 0.0)
    val names = set match {
      case "flights" => flights
      case "tpcds"   => tpcds
      case "cb"      => SparkEntry.queries.keys.filter(_.startsWith("cb_")).toSeq.sorted
      case "tail"    => tail
      case other if other.startsWith("only:") =>
        other.stripPrefix("only:").split(",").toSeq // ad-hoc re-probe subset
      case _         => worst
    }
    for (name <- names) {
      val a = time(name, sf01)
      val b = time(name, sf1)
      sumA += a; sumB += b
      println(f"| $name | $a%.3f | $b%.3f | ${b / a}%.1f× |")
    }
    println(f"| **total** | $sumA%.3f | $sumB%.3f | ${sumB / sumA}%.1f× |")
    spark.stop()
  }
}
