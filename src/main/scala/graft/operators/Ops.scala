package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.functions.agg._

/** Column/Dataset-level entry points for graft's custom aggregates and
  * composed operators (reference kernels cited on each member).
  */
object Ops {

  /** Spread a degenerate-parallelism input across the cluster before
    * CPU-heavy per-row work (guide §2.5's unsplittable-input case: a
    * single-row-group parquet file or tiny file set plans as 1-3 scan
    * tasks, so an expensive expression chain runs on one core while
    * the rest idle). No-op when the scan already has enough splits —
    * at production scale file layout supplies parallelism and no
    * extra exchange is added. Only for order-insensitive consumers
    * (aggregates, joins); round-robin repartition reorders rows. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Probe the PRE-AQE physical plan only. The old probe
    // (queryExecution.toRdd) returned the FINAL adaptive plan, and
    // with AQE on that eagerly materializes every upstream shuffle
    // stage at plan-build time — then the repartition builds a new
    // QueryExecution and the work re-runs at execution (double
    // execution of any shuffled input). A plan that already contains
    // an Exchange (shuffle or broadcast build) gets cluster
    // parallelism from the shuffle itself, so fan-out is pointless
    // there anyway: skip both the probe and the repartition. For the
    // remaining scan/project chains AQE does not wrap the plan
    // (InsertAdaptiveSparkPlan requires an exchange or a subquery),
    // so toRdd is pure planning — no job runs. Subquery-bearing plans
    // are skipped for the same eager-materialization reason.
    val plan = df.queryExecution.sparkPlan
    val hasStages = plan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case node => node.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
    }
    if (hasStages) df
    else {
      val cur = df.queryExecution.toRdd.getNumPartitions
      if (cur < math.max(2, target / 2)) df.repartition(target) else df
    }
  }

  /** window_funnel: max funnel depth within `windowSeconds` of the
    * first step (reference `be/src/exprs/agg/window_funnel.h`).
    * `step` must evaluate to the 0-based funnel step of the row. */
  def windowFunnel(windowSeconds: Long, ts: Column, step: Column, numSteps: Int): Column =
    column(WindowFunnelAgg(lit(windowSeconds).expr_, expression(ts), expression(step), numSteps)
      .toAggregateExpression())

  /** retention(conds): array[bool] — element 0 is bool_or(cond0),
    * element i is bool_or(cond0) AND bool_or(cond_i)
    * (reference `be/src/exprs/agg/retention.h`). Composed from
    * built-in aggregates — stays fully codegen'd. */
  def retention(conds: Seq[Column]): Column = {
    val base = bool_or(conds.head)
    array(base +: conds.tail.map(c => base && bool_or(c)): _*)
  }

  /** approx_top_k (reference `be/src/exprs/agg/approx_top_k.h`):
    * mergeable frequent-items sketch. */
  def approxTopK(item: Column, k: Int, maxMapSize: Int = 1024): Column =
    column(ApproxTopKAgg(expression(item), k, maxMapSize).toAggregateExpression())

  /** bitmap_union over longs → binary bitmap (reference
    * `be/src/exprs/agg/bitmap_union.h`). */
  def bitmapUnion(c: Column): Column =
    column(BitmapUnionAgg(expression(c)).toAggregateExpression())

  def bitmapCount(c: Column): Column = column(BitmapCount(expression(c)))
  def bitmapToArray(c: Column): Column = column(BitmapToArray(expression(c)))
  def bitmapAnd(a: Column, b: Column): Column = column(BitmapAnd(expression(a), expression(b)))
  def bitmapOr(a: Column, b: Column): Column = column(BitmapOr(expression(a), expression(b)))
  def bitmapXor(a: Column, b: Column): Column = column(BitmapXor(expression(a), expression(b)))

  /** bitmap_union_count = exact distinct count via bitmap. */
  def bitmapUnionCount(c: Column): Column = bitmapCount(bitmapUnion(c))

  /** sum_map: merge maps summing values per key (reference
    * `be/src/exprs/agg/sum_map.h`). Composed: explode → sum → rebuild.
    * Returns df grouped by `groupCols` with a `sum_map` map column. */
  def sumMap(df: DataFrame, groupCols: Seq[String], mapCol: String): DataFrame = {
    df.select(groupCols.map(col) :+ explode(col(mapCol)).as(Seq("__k", "__v")): _*)
      .groupBy((groupCols.map(col) :+ col("__k")): _*)
      .agg(sum(col("__v")).as("__sum"))
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(array_sort(collect_list(struct(col("__k"), col("__sum")))))
        .as("sum_map"))
  }

  /** Equi-HEIGHT histogram (the reference's ANALYZE-stats histogram,
    * `be/src/exprs/agg/histogram.h`): ~n/buckets rows per bucket,
    * emitted as (bucket, lower, upper, cnt, cum_count, upper_repeats)
    * — the same per-bucket facts the reference packs into its bucket
    * JSON (lower/upper/cumulative count/upper repeats).
    *
    * Distributed formulation: the reference walks every (sampled)
    * value sequentially in one buffer; here bucket CUTS are the
    * k/buckets quantiles from ExactPercentile's histogram-refinement
    * selection (full-parallelism scans, O(1) task memory), bucket
    * assignment is a scan-side compare against the broadcast cuts,
    * and per-bucket stats are one hash aggregation. Boundary law
    * differs from the reference's "close at >= bucket_size" walk —
    * both are valid equi-height quantizations; this one is
    * deterministic and recomputable in plain SQL (the gate's DuckDB
    * oracle proves it).
    */
  def equiHeightHistogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 buckets")
    val keyed = df.withColumn("__g", lit(0))
    val cutNames = (1 until buckets).map(k => s"c$k")
    val cuts = ExactPercentile.percentiles(
      keyed, Seq("__g"), c, cutNames.zip((1 until buckets).map(_.toDouble / buckets)))
      .select(cutNames.map(col): _*)
      .head() // 1 row × (buckets-1) cut scalars — driver-side by design
    val cutVals = (0 until buckets - 1).map(cuts.getDouble)
    val v = col(c).cast("double")
    // bucket = number of cuts strictly below v (upper-inclusive buckets)
    val bucketExpr = cutVals.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(v > lit(cut), 1).otherwise(0)
    }
    // pinned: the upper-repeats pass and the final join both consume
    // the per-bucket summary — unpinned, the full scan + aggregation
    // ran twice (the summary is <= buckets rows)
    val perBucket = df.filter(v.isNotNull)
      .withColumn("bucket", bucketExpr)
      .groupBy(col("bucket"))
      .agg(min(v).as("lower"), max(v).as("upper"), count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // upper_repeats needs the bucket max first: join the per-bucket
    // upper back and count equal rows (broadcast of <= buckets rows)
    val uppers = perBucket.select(col("bucket"), col("upper"))
    val repeats = df.filter(v.isNotNull).withColumn("bucket", bucketExpr)
      .join(broadcast(uppers), "bucket")
      .filter(v === col("upper"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("upper_repeats"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket")) // window over <= buckets summary rows
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perBucket.join(repeats, "bucket")
      .withColumn("cum_count", sum(col("cnt")).over(wCum))
      .orderBy(col("bucket"))
  }

  /** Equi-width histogram over a numeric column (reference
    * `be/src/exprs/agg/histogram.h` — the reference's is equi-height
    * for the optimizer; this library op is the user-facing analogue).
    * Deterministic: bucket i covers [lo + i*w, lo + (i+1)*w). */
  def histogram(df: DataFrame, c: String, buckets: Int, lo: Double, hi: Double): DataFrame = {
    val w = (hi - lo) / buckets
    df.filter(col(c) >= lo && col(c) < hi)
      .withColumn("bucket", floor((col(c) - lo) / w).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(c)).as("lo_seen"), max(col(c)).as("hi_seen"))
      .withColumn("bucket_lo", lit(lo) + col("bucket") * w)
      .orderBy(col("bucket"))
  }

  /** QUALIFY (reference SQL surface: filter on a window expression,
    * `QualifyOperator` in the FE): desugars exactly as the reference
    * does — materialize the window expression, filter on it, drop it.
    * Catalyst's InferWindowGroupLimit still kicks in for ranking
    * predicates (rn <= k), so `qualify(df, row_number().over(w) <= k)`
    * plans the same WindowGroupLimit as an explicit top-n. */
  def qualify(df: DataFrame, windowPredicate: Column): DataFrame = {
    val q = "__qualify"
    df.withColumn(q, windowPredicate).filter(col(q)).drop(q)
  }

  private implicit class ColExpr(c: Column) {
    def expr_ : org.apache.spark.sql.catalyst.expressions.Expression = expression(c)
  }
}
