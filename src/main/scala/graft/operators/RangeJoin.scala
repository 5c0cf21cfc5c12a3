package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (point-in-interval / band) join.
  *
  * Spark has no native range-join strategy: `points.join(intervals,
  * p >= lo && p <= hi)` plans a BroadcastNestedLoopJoin — every point
  * probes every interval, O(|P| x |I|) work and a broadcast (or a
  * cartesian when both sides are big). Fine for a 3-row band table
  * (see the `join_nonequi_bands` gate); fatal when the interval side is
  * itself large. The reference derives range predicates into its join
  * planning (`fe/.../DeriveRangeJoinPredicateRule.java`); engines like
  * Databricks' range-join optimization use the same binning idea below.
  *
  * Approach: quantize the value axis into bins of `binSize`. A point
  * lands in exactly one bin; an interval is replicated into every bin
  * it overlaps. Joining on the bin id is then a plain EQUI join —
  * shuffle-partitioned both sides, AQE-eligible, codegen'd — and the
  * exact `[lo, hi]` containment runs as a residual filter on the
  * bin-colocated candidates only.
  *
  * Scale properties:
  *  - work is O(|P| + |I| x spread + candidates), not |P| x |I|;
  *    `spread` = mean interval width / binSize + 1 is the replication
  *    factor, so pick binSize near the TYPICAL interval width: much
  *    smaller explodes the interval side, much larger degrades toward
  *    all-pairs within a bin.
  *  - no duplicate results and no dedup pass: a point matches an
  *    interval only in the point's own single bin.
  *  - skew surfaces as a hot bin (dense axis region) — AQE skew-join
  *    splits it like any other skewed equi key.
  */
object RangeJoin {

  /** Inner-join `points` to every interval containing them:
    * pCol in [loCol, hiCol] (inclusive ends). Columns must be numeric
    * (cast dates to day numbers first). Output = point columns +
    * interval columns, bin key dropped. */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binSize: Double): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def bin(c: Column): Column = floor(c / binSize).cast("long")
    val pb = points.withColumn("__bin", bin(col(pCol)))
    // drop empty intervals BEFORE the explode: Spark's sequence(a, b)
    // generates a DESCENDING range when b < a, which would replicate an
    // empty interval into bins it doesn't overlap (harmless for
    // correctness — the residual filter kills the rows — but wasted work)
    val ib = intervals.filter(col(loCol) <= col(hiCol)).withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: every (left, right) pair of intervals with
    * `[lLo, lHi]` ∩ `[rLo, rHi]` ≠ ∅ (inclusive ends), optionally
    * within `equiKeys` groups. Both sides replicate into the bins they
    * cover and meet on the bin equi key; a pair sharing several bins
    * is emitted EXACTLY once via the canonical-bin rule (only in the
    * bin containing max(lLo, rLo) — the overlap's left edge), so no
    * dedup pass is needed. Same scale properties as
    * [[pointInInterval]], with replication on both sides. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binSize: Double, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def bin(c: Column): Column = floor(c / binSize).cast("long")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo) <= col(hi)).withColumn("__bin",
        explode(sequence(bin(col(lo)), bin(col(hi)))))
    binned(left, lLo, lHi)
      .join(binned(right, rLo, rHi), "__bin" +: equiKeys)
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("__bin") === bin(greatest(col(lLo), col(rLo))))
      .drop("__bin")
  }
}
