package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Reference exposes the scalar kernels (cosine_similarity /
  * l2_distance, `gensrc/script/functions.py:62-72`); the search
  * operators are the standard scale path built on them.
  *
  * Scale design:
  *  - brute-force top-k BROADCASTS the query set and fuses the cosine
  *    kernel into the corpus scan (one pass, no shuffle of the 100 TB
  *    side), then per-query top-k via window group-limit;
  *  - LSH (random hyperplanes) buckets the corpus once (scan-side
  *    signature, deterministic seeded planes), so candidate pairs are
  *    intra-bucket only — the ANN path when the query set is large;
  *  - IVF-style variant: coarse k-means-ish centroids via bucketed
  *    sampling would follow the same join-on-bucket shape.
  */
object Similarity {

  /** Brute-force cosine top-k: for each query row, the k nearest
    * corpus rows. Queries should be small (broadcast side). */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .select(col(queryId), col(corpusId),
        cosine_similarity(col(corpusVec), col(queryVec)).as("cos"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId), round(col("cos"), 6).as("cos"), col("rk").cast("long").as("rk"))
  }

  /** Deterministic random hyperplanes: planes(i) is a vector whose
    * component j is derived from a seeded splitmix-style mix of
    * (seed, i, j) — reproducible across sessions, no RNG state. */
  private def planeComponent(seed: Long, plane: Int, j: Column): Column = {
    // xxhash64 of (seed, plane, j) mapped to ±1.0
    when(pmod(xxhash64(lit(seed), lit(plane), j), lit(2)) === 0, 1.0).otherwise(-1.0)
  }

  /** Add a `__bucket` column = LSH signature from `planes` sign bits.
    * Sign bit i = sign(dot(vec, plane_i)) with ±1 plane components —
    * computed with codegen'd higher-order functions in the scan. */
  def withLshBucket(df: DataFrame, vecCol: String, planes: Int, seed: Long): DataFrame = {
    val v = col(vecCol)
    val idx = sequence(lit(0), size(v) - 1)
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(v, idx, (x, j) => x * planeComponent(seed, p, j)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    df.withColumn("__bucket", bits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** LSH ANN top-k: like bruteForceTopK but only pairs sharing an LSH
    * bucket are scored. Recall comes from two knobs: `tables`
    * independent hash tables, and `probes` — multi-probe LSH (Lv et
    * al., VLDB'07): each QUERY also probes the buckets within Hamming
    * distance <= probes of its signature. Probing expands only the
    * broadcast query side ((1 + planes) rows per query at probes=1);
    * the corpus keeps exactly one bucket per row per table, so the
    * 100 TB side is still scanned/bucketed once. */
  def lshTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, planes: Int = 10, tables: Int = 3, probes: Int = 1,
      seed: Long = 42L): DataFrame = {
    val scored = (0 until tables).map { t =>
      val cb = withLshBucket(corpus, corpusVec, planes, seed + t)
        .select(col("__bucket"), col(corpusId), col(corpusVec))
      val qb0 = withLshBucket(queries, queryVec, planes, seed + t)
      val probeBuckets =
        if (probes <= 0) array(col("__bucket"))
        else array(col("__bucket") +:
          (0 until planes).map(b => col("__bucket").bitwiseXOR(lit(1L << b))): _*)
      val qb = qb0
        .select(explode(probeBuckets).as("__bucket"), col(queryId), col(queryVec))
      cb.join(broadcast(qb), Seq("__bucket"))
        .select(col(queryId), col(corpusId),
          cosine_similarity(col(corpusVec), col(queryVec)).as("cos"))
    }.reduce(_ unionByName _).distinct()
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId), round(col("cos"), 6).as("cos"), col("rk").cast("long").as("rk"))
  }
}
