package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation. PageRank (Page et
  * al., "The PageRank Citation Ranking", 1999) is the classic
  * quality/centrality prior for crawled corpora: rank mass flowing to
  * a page from the link graph is a spam-resistant quality signal used
  * to weight or gate training documents.
  *
  * Spark shape: the power iteration IS a loop of shuffle joins —
  * contributions = edges ⋈ ranks ⋈ outdeg grouped by dst; each
  * iteration is one shuffle on the node id. Scale notes (100 TB-class
  * web graphs):
  *  - the edge table is the big side and is scanned once per
  *    iteration — pre-partition it on `src` (bucketing) so the
  *    rank join co-locates and only the (small) rank table moves;
  *  - iterations extend lineage linearly; for deep runs pass
  *    `checkpointEvery` so the plan is cut with localCheckpoint
  *    (RDD-backed, partition-deterministic) instead of growing an
  *    O(iters) DAG;
  *  - dangling nodes (no out-links) leak their mass — the standard
  *    simplification; ranks then sum to < 1 but ordering, the signal
  *    curation needs, is unaffected.
  */
object Graph {

  /** Damped PageRank after a FIXED number of power iterations
    * (deterministic — no convergence test), rank rounded to 6 dp.
    * Output: (id, rank). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 5,
      checkpointEvery: Int = Int.MaxValue): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val n = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("n")).as("rank"))
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("inflow"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(n))
        .select(col("id"),
          (lit((1.0 - damping)) / col("n") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint(eager = false)
    }
    ranks.select(col("id"), round(col("rank"), 6).as("rank"))
  }
}
