package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{Engine, Session, SparkEntry}

/** Dev tool: dump `explain("formatted")` for flagship queries to
  * PLANS.md — the physical-plan evidence (pushdown, pruning,
  * broadcast choices, partial aggregation, top-n fusion) behind the
  * PlanSpec assertions, in reviewable form.
  * args: sfDir [outFile] */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    Session.prepare(spark)

    val flagship = Seq(
      "q1_pricing_summary" -> "TPC-H Q1: scan-heavy two-phase aggregation",
      "q3_shipping_priority" -> "TPC-H Q3: broadcast dims + TakeOrderedAndProject",
      "ssb_q4_1" -> "SSB Q4.1: star join — all dims broadcast, one fact-fact shuffle",
      "cb_top_users" -> "ClickBench top-N: join-free single-shuffle group-by",
      "agg_percentiles" -> "ExactPercentile: distributed selection (no value buffering)",
      "agg_weighted_percentile" -> "Weighted quantiles: bucket weight sums + threshold-bucket re-scan",
      "dedup_minhash" -> "MinHash-LSH dedup: codegen signatures, banded candidates",
      "chunk_documents" -> "Corpus chunking: scan-side explode, no shuffle below Generate",
      "join_salted" -> "Salted skew join: salt in the join keys",
      "win_partition_topn" -> "Partition top-n: WindowGroupLimit pushdown",
      "text_quality_gopher" -> "Gopher quality: scan-side stats + map-side bigram partials",
      "tpcds_returns_net" -> "TPC-DS Q80 mechanics: agg branches FULL OUTER + broadcast dim",
      "ts_capped_balance" -> "Custom exec: key-clustered exchange + sort + BoundedAccumulate scan",
      "join_range_auto" -> "RangeJoinRewrite: plain BETWEEN join auto-binned to an equi join",
      "geo_radius_join" -> "Lat-banded radius join: interval explode + equi join + haversine residual",
      "evt_rolling_wau" -> "Rolling distinct rewrite: bounded explode + one distinct-count shuffle",
      "sketch_count_min" -> "Count-min build: explode + partial/final agg, output bounded by the grid",
      "tpcds_q64_sales_chain" -> "TPC-DS Q64 composition: aux HAVING CTE + mega dim join + cross-year CTE self-join (see CTE note)",
      "tpcds_yoy_cte_stack" -> "TPC-DS Q11 mechanics: one year_total CTE self-joined 4x, per-instance (sale_type, year) filters pushed into each scan",
      "tpcds_three_channel_ratio" -> "TPC-DS Q78 mechanics: three anti-return channel CTEs, store LEFT JOINs the others, COALESCE'd ratio report",
      "sim_ivf_persisted" -> "Persisted IVF-PQ query, phase 2 of 2: id-pruned exact rerank (broadcast shortlist LocalRelation + filtered corpus scan). Phase 1 — the scored shortlist — is COLLECTED by topK (bounded at rerank rows/query) so its plan is dumped separately below; zero training jobs in either phase",
      "tpcds_class_rev_share" -> "TPC-DS Q12/Q20/Q98 mechanics: one fact-side agg shuffle, share-of-class window over the grouped rows only",
      "tpcds_in_or_subquery" -> "TPC-DS Q45 mechanics: IN-list OR IN-subquery — subquery joined once, disjunction evaluated post-join (no double scan)",
      "tpcds_band_multi_distinct" -> "TPC-DS Q28 mechanics: per-band scalar aggregates with count-distinct, assembled by a broadcast nested-loop cross of single-row results",
      "src_lake_bitmap_index" -> "Bitmap index: sort-key-clustered scan with =/IN pruned by exact per-file value sets (the FileIndex consult — file counts in BitmapIndexSpec)",
      "src_iceberg_write_read_transform" -> "Iceberg transform pruning: days()+bucket() probes through readPruned — the kept-file scan, id-range + partition-struct constraints applied at plan time",
      "mv_minmax_poll" -> "Maintained min/max MV: the final poll's plan — delta-only groups unioned with the group-bounded rescan of extreme-retracting groups",
      "src_hudi_mor_read" -> "Hudi MoR read: dirty-group base anti-join on touched keys ∪ upsert LocalRelation ∪ clean-group full-speed scan",
      "src_hudi_mor_read_part" -> "Hudi MoR read, PARTITIONED: per-partition dirty base scans with timeline-restored partition literals, one anti-join, clean partition full-speed",
      "src_paimon_pk_read" -> "Paimon primary-key read: live LSM runs per partition, ONE window keyed by _KEY_* over _SEQUENCE_NUMBER (partial+final WindowGroupLimit around the exchange), retractions filtered",
      "src_delta_checkpoint_dv" -> "Delta checkpoint bootstrap with live DVs: add set + descriptors from ONE parquet read, dirty files anti-joined on (file, row_index)",
      "src_paimon_foreign_read" -> "FOREIGN paimon table (real manifests, BinaryRow partitions, ORC + PK system columns): per-partition scans with decoded literals, one merge window — same shape as own-layout reads",
      "src_paimon_changelog" -> "Paimon changelog-producer feed: ready-made changelog files scanned per version — NO prior-snapshot derivation, no merge window on the read path",
      "src_hudi_values_only" -> "Hudi values-only partitionPath: positional columns from hoodie.properties through the manifest-backed index — partition filters prune files before the scan",
      "src_paimon_dv_delete" -> "Paimon deletion-vector read: DV'd files masked by a (file, row_index) filter BELOW the merge window, DV-free files kept on the clean whole-stage-codegen scan",
      "src_delta_checkpoint_v2" -> "Delta V2 checkpoint bootstrap: UUID manifest → one sidecar add-parquet scan → DV mask — no JSON commit replay",
      "src_paimon_add_column" -> "Paimon evolved read: mixed-schema runs union under mergeSchema, the added column null-fills below the PK merge window",
      "src_delta_foreign_read" -> "FOREIGN Delta 3.1.0 log (real classic checkpoint + JSON tail, metadata-only): inventory is a LocalRelation of the replayed adds — stats parse + per-partition rollup, no data scan by construction",
      "src_iceberg_foreign_read" -> "REAL-SPEC Iceberg v2 read (full-schema Avro manifests, typed r102 partition values): identity sources live IN the data files, scan routes through the transform FileIndex — no column re-attachment, prune at listFiles",
      "src_paimon_dynamic_bucket" -> "Paimon dynamic-bucket read: sticky HASH-index routed buckets scan exactly like fixed ones — live runs per bucket, ONE merge window; CDC derivation still prunes prior files to touched buckets",
      "src_paimon_changelog_input" -> "Paimon changelog-producer=input feed: batch rows ARE the change files — pure changelog scan per version, no lookup derivation, no merge window",
      "src_iceberg_foreign_mor" -> "REAL-SPEC Iceberg v2 MoR read (content=1 delete manifests, reserved-field-id position-delete parquet): clean/dirty split — untouched files scan at full speed, only DELETE-touched files pay the broadcast anti-join on (_metadata.file_path, row_index)",
      "src_iceberg_foreign_eq" -> "REAL-SPEC Iceberg v2 EQUALITY deletes (content=2 data_file, equality_ids = table field-ids): sequence-tagged scan null-safe anti-joins the key columns with the STRICT dataSeq < deleteSeq residual — re-inserted CDC rows survive their own delete")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of flagship queries\n\n")
    sb.append(s"Generated by `graft.tools.DumpPlans` over `$sfDir`. These are\n")
    sb.append("the plans PlanSpec asserts on — regenerate after plan-affecting\nchanges.\n")
    for ((name, what) <- flagship) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $what\n\n```\n$plan```\n")
    }

    // the persisted-index query is two plans since the shortlist ids
    // are pushed into the rerank scan — dump phase 1 explicitly (the
    // gate above already built the standing index into the tmp path)
    {
      val path = graft.queries.Pipeline.vixGatePath(sfDir)
      val phase1 = graft.operators.VectorIndex.shortlistPlan(spark, path,
        "vec_id", graft.queries.Pipeline.annFixtureQueries(spark),
        "qid", "qvec", nprobe = 8, rerank = 400)
      val plan = phase1.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append("\n## sim_ivf_persisted, phase 1 of 2 — scored shortlist: " +
        "probe -> partition-pruned codes scan -> broadcast ADC LUT join -> " +
        "per-query top-(spill×rerank) window (partial WindowGroupLimit " +
        "below the exchange keeps ≤ spill×rerank per query per partition " +
        "map-side) -> late spill dedup of the survivors -> final rank — " +
        "no near-unique-key dedup shuffle of the full scored feed\n\n" +
        s"```\n$plan```\n")
    }
    sb.append(
      """
        |## CTE note — inline-always vs the reference's reuse decision
        |
        |`tpcds_q64_sales_chain` references its `cross_sales` CTE twice
        |(1995 side and 1996 side). The reference decides inline-vs-reuse by
        |cost (`QueryOptimizer.java` INLINE_CTE_RULES + CTEContext); Catalyst
        |INLINES deterministic multi-reference CTEs and then optimizes each
        |copy independently. The plan above shows the consequence: the
        |mega-join pipeline appears twice (6 lineitem scans, 0
        |ReusedExchange), BUT each copy's year predicate is pushed into its
        |own orders scan (`year(o_orderdate) = 1995` vs `= 1996`) — each
        |branch reads ~1/7 of the fact instead of sharing one full-table
        |materialization. At 100 TB that is usually the right trade when the
        |per-reference residual predicates are selective (they are here);
        |when the two references are IDENTICAL, AQE's ReusedExchange
        |recovers the sharing automatically (asserted for self-joins in
        |PlanSpec), so the uncovered case is only "expensive CTE, multiple
        |references, divergent predicates, low selectivity" — the
        |spill-the-CTE call the reference's cost model makes. An engine user
        |can force that explicitly with `df.persist()` on the CTE body; we
        |document rather than auto-decide it.
        |""".stripMargin)
    Files.write(Paths.get(outFile), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plans] wrote $outFile")
    spark.stop()
  }
}
