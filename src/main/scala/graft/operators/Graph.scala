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
  *  - iterations extend lineage linearly; every iteration's ranks are
  *    pinned ([[Pins.loopPin]] — localCheckpoint locally, replicated
  *    persist under `spark.graft.pins.replicated`) so the plan never
  *    grows an O(iters) DAG;
  *  - dangling nodes (no out-links) leak their mass — the standard
  *    simplification; ranks then sum to < 1 but ordering, the signal
  *    curation needs, is unaffected.
  */
object Graph {

  /** Damped PageRank after a FIXED number of power iterations
    * (deterministic — no convergence test), rank rounded to 6 dp.
    * Output: (id, rank). Lineage is truncated every iteration
    * unconditionally (see the pinning note below). The old
    * `checkpointEvery` cadence knob is REMOVED rather than silently
    * ignored — call sites tuning it learn at compile time that the
    * cadence is now unconditional. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      damping: Double = 0.85, iters: Int = 5): DataFrame = {
    // Pin the loop invariants (edges, node set, out-degrees) and
    // truncate each iteration's lineage: unpinned, iteration i's lazy
    // plan re-derives every earlier iteration's join chain, so total
    // work grows quadratically in `iters` and the edge scan re-runs
    // per consumer (GraphX/MLlib persist their edge RDDs for exactly
    // this reason). The node count is a driver scalar, not a per-
    // iteration broadcast subtree — same doubles, lit instead of col.
    val e = Pins.loopPin(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = Pins.loopPin(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct())
    val deg = Pins.loopPin(
      e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")))
    val n = nodes.count()
    var ranks = nodes.select(col("id"), (lit(1.0) / lit(n)).as("rank"))
    for (i <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("deg")).as("inflow"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping)) / lit(n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      if (i < iters) ranks = Pins.loopPin(ranks)
    }
    ranks.select(col("id"), round(col("rank"), 6).as("rank"))
  }

  /** Per-node triangle counts over an undirected graph — the local
    * clustering signal (spam farms and boilerplate link rings are
    * triangle-dense; organic link neighborhoods are sparse).
    *
    * Algorithm: degree-ordered edge orientation (Suri &
    * Vassilvitskii, "Counting Triangles and the Curse of the Last
    * Reducer", WWW 2011) — every edge points from its lower-(degree,
    * id) endpoint, wedges are built only at each edge's LOW end, and
    * a wedge closes iff its two tips are themselves an edge. Each
    * triangle is found exactly once (at its minimum-(degree, id)
    * vertex). The orientation caps out-degree at O(√m), so wedge
    * volume is Σ outdeg² ≈ m^1.5 instead of the Σ deg² blowup that a
    * hub vertex causes in the naive plan — the difference between a
    * web crawl's 10^6-degree hub generating 10^12 wedges or 10^6.
    * Three shuffles total: degree agg, wedge build, closure join. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val aLow = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val dirE = withDeg.select(
      when(aLow, col("a")).otherwise(col("b")).as("p"),
      when(aLow, col("b")).otherwise(col("a")).as("q"))
    val wedges = dirE.select(col("p"), col("q").as("u"))
      .join(dirE.select(col("p"), col("q").as("v")), "p")
      .filter(col("u") < col("v"))
    val tris = wedges
      .select(col("p"), least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .join(canon, Seq("a", "b"), "left_semi")
    tris.select(col("p").as("id"))
      .union(tris.select(col("a").as("id")))
      .union(tris.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** k-core: the maximal subgraph where every node has degree ≥ k —
    * the dense-cluster extractor (link-farm / spam-community detection
    * over a crawl graph). Iterative peeling: drop nodes under degree
    * k, recompute degrees on the induced subgraph, repeat to fixpoint.
    * Rounds are bounded by the peel depth (≤ graph degeneracy, tiny
    * for web-like graphs); each round is one degree aggregation + two
    * semi-joins, localCheckpoint'ed so lineage stays flat. The
    * convergence check is one count per round — a scalar to the
    * driver, same class as AQE's stats. Returns surviving (id, deg)
    * with the induced in-core degree. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 50): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    canon = Pins.loopPin(canon)
    var done = false
    var it = 0
    while (!done && it < maxIter) {
      val deg = canon.select(col("a").as("id"))
        .union(canon.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("id"))
      val pruned = Pins.loopPin(canon
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi"))
      val before = canon.count(); val after = pruned.count()
      canon = pruned
      done = after == before
      it += 1
    }
    if (!done) throw new IllegalStateException(
      s"kCore did not converge in $maxIter rounds")
    canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
  }

  /** Single-source BFS levels (undirected): hop distance from `source`
    * for every reachable node. Frontier expansion — each round joins
    * the current frontier to the edge list, anti-joins the visited
    * set, and checkpoints; rounds = graph diameter (small-world graphs:
    * single digits even at web scale). The per-round convergence probe
    * is one count — a scalar, not data, to the driver. */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
      source: Long, maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
      .union(edges.select(col(dstCol).cast("long").as("s"), col(srcCol).cast("long").as("d")))
      .filter(col("s") =!= col("d")).distinct()
    val symPinned = Pins.loopPin(sym)
    var visited = Pins.loopPin(Seq((source, 0)).toDF("id", "level"))
    var frontier = visited.select(col("id"))
    var level = 0
    var n = frontier.count()
    while (n > 0 && level < maxIter) {
      level += 1
      frontier = Pins.loopPin(
        symPinned.join(frontier.select(col("id").as("s")), Seq("s"))
          .select(col("d").as("id")).distinct()
          .join(visited.select(col("id")), Seq("id"), "left_anti"))
      n = frontier.count()
      if (n > 0)
        visited = Pins.loopPin(
          visited.unionByName(frontier.withColumn("level", lit(level))))
    }
    if (n > 0) throw new IllegalStateException(
      s"bfsLevels did not converge in $maxIter rounds")
    visited
  }
}
