package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch as a relational operator — the streaming frequency
  * summary alongside the engine's other sketches (theta, HLL,
  * t-digest; ref `be/src/exprs/agg/` sketch family). Cormode &
  * Muthukrishnan 2005: a depth × width counter grid; each occurrence
  * increments one counter per row (hash_r(key) mod width); a point
  * estimate is the MINIMUM of a key's `depth` counters — an upper
  * bound on the true count, within εN with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Spark-first shape: the sketch IS a (row, bucket, count) DataFrame.
  * Build = explode `depth` hashes per occurrence → one aggregation —
  * map-side combine means the shuffle carries at most depth × width
  * rows PER TASK regardless of input size, and the final sketch is
  * ≤ depth × width rows total: constant-size output from a 100 TB
  * scan, like any sketch. Estimate = broadcast the (tiny) sketch onto
  * the query keys and take min over rows. Hashing is xxhash64 with
  * the row index mixed in — deterministic across runs and engines.
  */
object CountMin {

  /** Build the sketch table `(r, b, cnt)` over `keyCol` occurrences
    * (optionally weighted). */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int,
      weightCol: Option[String] = None): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    df.select(col(keyCol).as("__k"), w.as("__w"))
      .withColumn("r", explode(array((0 until depth).map(lit): _*)))
      .select(col("r"),
        pmod(xxhash64(col("__k"), col("r")), lit(width)).as("b"), col("__w"))
      .groupBy("r", "b").agg(sum("__w").as("cnt"))
  }

  /** Sketch union — count-min is linear, so merging is elementwise
    * addition of the counter grids (the property that makes it a
    * sketch: build per partition/day/source, add later). */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.sum
    a.unionByName(b).groupBy("r", "b").agg(sum("cnt").as("cnt"))
  }

  /** Join-size estimate |A ⋈ B| on the sketched key: min over rows of
    * the per-row inner product Σ_b cntA·cntB — the classic CM use for
    * cardinality estimation (feeds the same planning decision as
    * rpt_skew_diagnostics). Upper bound; exact when neither sketch
    * has colliding keys. Work is one depth×width-bounded join. */
  def innerProduct(a: DataFrame, b: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, min, sum}
    a.select(col("r"), col("b"), col("cnt").as("ca"))
      .join(b.select(col("r"), col("b"), col("cnt").as("cb")), Seq("r", "b"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min("ip").as("est_join_size"))
  }

  /** Point estimates for `keys(keyCol)`: min over the sketch rows.
    * The sketch is depth × width rows at most — always broadcast. */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val probes = keys.select(col(keyCol))
      .withColumn("r", explode(array((0 until depth).map(lit): _*)))
      .withColumn("b", pmod(xxhash64(col(keyCol), col("r")), lit(width)))
    probes.join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
