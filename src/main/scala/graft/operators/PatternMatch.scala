package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE-lite: contiguous `A B+ C` row-pattern matches per
  * key in event order — the row-pattern surface Flink/Trino/Oracle
  * expose that Spark lacks (and the general form of the reference's
  * sequence_match family, `gensrc/script/functions.py`).
  *
  * Spark-first realization (SURVEY §7.3 rung a — composition beats a
  * custom exec here): label rows A/B/C, isolate maximal B-runs with
  * the gaps-and-islands trick (rn − rn-within-B is constant per run),
  * then a run matches iff the row immediately BEFORE it is A and the
  * row immediately AFTER it is C. Every step is a window over the
  * per-key ordering (one sort) plus one aggregation — no per-row
  * state machine, no UDF, scales like any windowed query. Greedy +
  * non-overlapping by construction (maximal runs can't overlap).
  */
object PatternMatch {

  /** One row per match: key, first/last event ids, B-run length. */
  def matchABplusC(df: DataFrame, keyCol: String, orderCols: Seq[String],
      idCol: String, isA: Column, isB: Column, isC: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val labeled = df
      .withColumn("__lbl", when(isA, "A").when(isB, "B").when(isC, "C").otherwise("X"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev_lbl", lag("__lbl", 1).over(w))
      .withColumn("__prev_id", lag(col(idCol), 1).over(w))
      .withColumn("__next_lbl", lead("__lbl", 1).over(w))
      .withColumn("__next_id", lead(col(idCol), 1).over(w))
    val bRows = labeled.where(col("__lbl") === "B")
      .withColumn("__island", col("__rn") -
        row_number().over(Window.partitionBy(keyCol).orderBy(col("__rn"))))
    bRows.groupBy(col(keyCol), col("__island"))
      .agg(count(lit(1)).as("n_b"),
        min(struct(col("__rn"), col("__prev_lbl"), col("__prev_id"))).as("__first"),
        max(struct(col("__rn"), col("__next_lbl"), col("__next_id"))).as("__last"))
      .where(col("__first.__prev_lbl") === "A" && col("__last.__next_lbl") === "C")
      .select(col(keyCol), col("__first.__prev_id").as("start_id"),
        col("__last.__next_id").as("end_id"), col("n_b"))
  }
}
