package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table/column profiling — the engine-side ANALYZE that feeds a cost
  * model (ref `fe/fe-core/.../statistic/` collect jobs: row count,
  * null count, NDV, min/max per column). One full-parallelism scan
  * computes every column's statistics as ONE aggregate row (each stat
  * is an independent partial agg, all map-side combined), which then
  * unpivots driver-free into the (column, stat...) shape a catalog
  * stores. NDV is exact here; swap `approx_count_distinct` in at
  * 100 TB for one-pass sketched NDV — same plan shape.
  */
object Profile {

  /** Numeric-column profile: one row per column with
    * (n, n_null, ndv, min_v, max_v, mean) — values as doubles, the
    * mean routed through DECIMAL so it is merge-order stable. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        (sum(col(c).cast("decimal(28,6)")).cast("double") / count(col(c)))
          .as(s"${c}__mean"))
    }
    // multi-distinct plans via Expand (rows x distinct-count); on a
    // degenerate single-split scan that whole blow-up runs on one
    // core — spread it first (no-op when the scan has real splits)
    val one = Ops.fanOut(df.select(cols.map(col): _*)).agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', ${c}__n, ${c}__nnull, ${c}__ndv, ${c}__min, ${c}__max, ${c}__mean"
    }.mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stacked) " +
      "AS (col_name, n, n_null, ndv, min_v, max_v, mean)")
  }
}
