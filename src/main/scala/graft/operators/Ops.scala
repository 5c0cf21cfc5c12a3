package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.functions.agg._

/** Column/Dataset-level entry points for graft's custom aggregates and
  * composed operators (reference kernels cited on each member).
  */
object Ops {

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

  private implicit class ColExpr(c: Column) {
    def expr_ : org.apache.spark.sql.catalyst.expressions.Expression = expression(c)
  }
}
