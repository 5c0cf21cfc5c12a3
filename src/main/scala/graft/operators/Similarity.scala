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

  /** Brute-force EUCLIDEAN top-k — the metric-matched ground truth for
    * the PQ/IVF-PQ indexes (which rank by L2): recall measured against
    * a cosine truth on non-unit-norm embeddings would score
    * cross-metric agreement, not index quality. Same plan shape as
    * [[bruteForceTopK]]: broadcast queries, one corpus pass. */
  def bruteForceTopKL2(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .select(col(queryId), col(corpusId),
        l2_distance(col(corpusVec), col(queryVec)).as("l2"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("l2"), col(corpusId))
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId), round(col("l2"), 6).as("l2"), col("rk").cast("long").as("rk"))
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
    }.reduce(_ unionByName _)
      // a pair colliding in several tables/probes appears once per
      // collision; aggregate by pair (cos is identical across tables)
      // instead of distinct() — same single shuffle, but hash-agg
      // combines map-side and never compares full rows on a double
      .groupBy(col(queryId), col(corpusId)).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId), round(col("cos"), 6).as("cos"), col("rk").cast("long").as("rk"))
  }

  // ---------------- IVF (inverted-file) ANN ----------------

  /** Nearest-centroid cell id for a vector: argmax over C codegen'd
    * cosine kernels against literal centroids (C is small — tens to a
    * few hundred — so this stays a scan-side expression). */
  private[operators] def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column = {
    val cos = centroids.map(ct => cosine_similarity(vec, typedlit(ct)))
    val arr = array(cos: _*)
    (array_position(arr, array_max(arr)) - 1).cast("int")
  }

  // ---------------- full-corpus k-means ----------------

  /** Full-corpus Lloyd k-means (vs [[trainIvfCentroids]]'s bounded
    * sample): the clustering operator itself, used by semantic dedup
    * (SemDeDup, Abbas et al. 2023) and corpus curation, where the
    * cluster assignment of EVERY row is the product, not just the
    * codebook.
    *
    * Scale shape per iteration: assignment is a scan-side argmax over
    * k codegen'd cosine kernels (no shuffle of the corpus rows);
    * the mean update shuffles (cell, dim) partial sums — partial
    * aggregation collapses each task's contribution to at most
    * k×dim rows before the exchange, so the shuffle is
    * codebook-bounded, not corpus-bounded. Driver traffic is the
    * k×dim codebook (KBs) per iteration.
    *
    * Init is deterministic farthest-point (maximin, the greedy
    * k-means++ variant): seed 1 by min hash, then each next seed is
    * the corpus vector farthest (min max-cosine) from the chosen
    * set, hash tie-broken. Random init can drop all k seeds into one
    * natural cluster and strand Lloyd in a split/merged local
    * optimum; maximin guarantees one seed per well-separated cluster.
    * The greedy selection runs DRIVER-LOCAL over a bounded
    * hash-ordered sample (`initSampleN` rows collected — one job,
    * MBs; the same bounded-sample-to-driver pattern as
    * [[trainIvfCentroids]]): k sequential cluster jobs for the
    * selection would put a k×(job-latency) floor on training, and
    * maximin needs only ONE sample point per natural cluster, so a
    * few thousand samples cover any practical k. Lloyd itself
    * iterates over the full corpus, distributed. */
  def kMeansTrain(corpus: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, seed: Long = 42L,
      initSampleN: Int = 4096): Array[Array[Double]] = {
    // persist the projected vectors: the init sample plus every Lloyd
    // iteration re-consumes the same projection (1 + iters passes);
    // without pinning each pass re-runs the scan + cast + hash
    // (MLlib's KMeans requires exactly this persistence for the same
    // reason). MEMORY_AND_DISK: bounded by the corpus' vector column,
    // spills instead of OOM at scale.
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__h", xxhash64(to_json(col("__v")), lit(seed)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sample: Array[Array[Double]] = vecs
      .orderBy(col("__h")).limit(initSampleN)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "k-means init: empty corpus")
    def cosLocal(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // greedy maximin over the sample: next seed = sample row with the
    // smallest max-cosine to the chosen set; ties keep hash order
    val chosenIdx = scala.collection.mutable.ArrayBuffer(0)
    val maxCosTo = Array.fill(sample.length)(-2.0)
    while (chosenIdx.length < math.min(k, sample.length)) {
      val last = sample(chosenIdx.last)
      var best = -1; var bestScore = 2.0
      var i = 0
      while (i < sample.length) {
        val c = cosLocal(sample(i), last)
        if (c > maxCosTo(i)) maxCosTo(i) = c
        if (!chosenIdx.contains(i) && maxCosTo(i) < bestScore) {
          bestScore = maxCosTo(i); best = i
        }
        i += 1
      }
      chosenIdx += best
    }
    var centroids: Array[Array[Double]] = chosenIdx.map(sample).toArray
    for (_ <- 0 until iters) {
      // sum+count instead of avg: both are map-side combinable and the
      // final division happens on k×dim rows. The cell id is projected
      // to an ATTRIBUTE before posexplode: a Generate re-evaluates its
      // carried projections per OUTPUT row, so fusing the k-kernel
      // argmax into the explode select costs dim× the kernels
      // (measured 28 s vs 0.9 s at k=64, dim=12, sf0.1)
      // ONE shuffle per iteration: the (cell, pos) partial sums are
      // k x dim rows — bounded, so the final mean assembly runs on the
      // driver instead of a second exchange + collect_list aggregation
      // (same s/n division on the same doubles; plan loses one
      // Exchange per Lloyd iteration)
      val updated = vecs
        .select(nearestCell(col("__v"), centroids).as("__cell"), col("__v"))
        .select(col("__cell"), posexplode(col("__v")))
        .groupBy(col("__cell"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(r => r.getDouble(2) / r.getLong(3)).toArray
        }
      // empty cells keep their previous centroid
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    vecs.unpersist(blocking = false)
    centroids
  }

  /** Assign every corpus row to its nearest learned centroid:
    * (id, cell, cos) — pure scan-side expressions, no shuffle. */
  def kMeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val cos = centroids.map(ct => cosine_similarity(v, typedlit(ct)))
    val arr = array(cos: _*)
    corpus.select(col(idCol), col(vecCol),
      (array_position(arr, array_max(arr)) - 1).cast("int").as("cell"),
      array_max(arr).as("cos"))
  }

  /** Train + assign in one call. */
  def kMeans(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, seed: Long = 42L): DataFrame =
    kMeansAssign(corpus, idCol, vecCol, kMeansTrain(corpus, vecCol, k, iters, seed))

  /** Top-`nprobe` cells for a query vector, as an exploded column of
    * structs sorted by descending centroid cosine. */
  private[operators] def probeCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    val entries = centroids.indices.map { i =>
      struct(cosine_similarity(vec, typedlit(centroids(i))).as("c"), lit(i).as("i"))
    }
    explode(slice(reverse(array_sort(array(entries: _*))), 1, nprobe))
  }

  /** Train coarse IVF centroids: deterministic hash-ordered sample of
    * `sampleN` corpus vectors, `c` seeds, then `iters` distributed
    * Lloyd iterations (scan-side assignment + per-dimension average).
    * Returns C×dim doubles to the driver — KBs, independent of corpus
    * size; at 100 TB only the bounded sample is ever shuffled. */
  def trainIvfCentroids(corpus: DataFrame, vecCol: String, c: Int,
      iters: Int = 2, sampleN: Int = 10000, seed: Long = 42L): Array[Array[Double]] = {
    val sample = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__h", xxhash64(to_json(col("__v")), lit(seed)))
      .orderBy(col("__h")).limit(sampleN)
      .select(col("__v")).cache()
    var centroids: Array[Array[Double]] =
      sample.limit(c).collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val updated = sample
        .select(nearestCell(col("__v"), centroids).as("__cell"), posexplode(col("__v")))
        .groupBy(col("__cell"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("__cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getDouble(1)).toArray)
        .toMap
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    sample.unpersist()
    centroids
  }

  /** IVF ANN top-k — the large-query-set regime where per-query
    * brute force is too expensive and LSH bucket collisions are too
    * random: corpus is assigned ONCE to its nearest of `c` learned
    * centroids (scan-side, no shuffle), each query probes its
    * `nprobe` closest cells, and only intra-cell pairs are scored.
    *
    * `spill` > 1 multi-assigns each corpus row to its top-`spill`
    * cells (the SPANN/multiple-assignment recall lever): on weakly
    * clustered corpora a true neighbor often sits just across a cell
    * boundary, and replicating boundary rows into their runner-up
    * cells recovers it at `spill`× the index storage — measured on
    * the full-SF embeddings: recall@5 0.75 → 0.93 going spill 1→2 at
    * c=16/nprobe=8 (the xb_ivf_recall_fullsf gate pins a 0.90 floor
    * on the spill=2 configuration). Scoring is exact cosine on every
    * surviving pair,
    * so there is no rerank pass to add (nothing approximate to
    * refine); at spill=1 each row lives in exactly one cell and no
    * dedup runs (the single-assignment plan is unchanged), at
    * spill>1 pairs colliding in several cells collapse via a
    * map-side-combinable max. */
  def ivfTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, c: Int = 16, nprobe: Int = 4, iters: Int = 2,
      seed: Long = 42L, spill: Int = 1): DataFrame = {
    val cents = trainIvfCentroids(corpus, corpusVec, c, iters, seed = seed)
    val cb =
      if (spill <= 1)
        corpus.select(nearestCell(col(corpusVec), cents).as("__cell"),
          col(corpusId), col(corpusVec))
      else
        corpus.select(probeCells(col(corpusVec), cents, spill).as("__probe"),
            col(corpusId), col(corpusVec))
          .select(col("__probe.i").as("__cell"), col(corpusId), col(corpusVec))
    val qb = queries.select(probeCells(col(queryVec), cents, nprobe).as("__probe"),
        col(queryId), col(queryVec))
      .select(col("__probe.i").as("__cell"), col(queryId), col(queryVec))
    val scored0 = cb.join(broadcast(qb), Seq("__cell"))
      .select(col(queryId), col(corpusId),
        cosine_similarity(col(corpusVec), col(queryVec)).as("cos"))
    val scored = if (spill <= 1) scored0
      else scored0.groupBy(col(queryId), col(corpusId)).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId), round(col("cos"), 6).as("cos"), col("rk").cast("long").as("rk"))
  }

  /** IVF-PQ composed index (Jégou et al. IVFADC, the shape every
    * billion-vector system deploys): the coarse IVF quantizer prunes
    * the corpus to each query's `nprobe` cells, PQ codes score the
    * surviving rows in the compressed domain (no float vectors touched
    * on the big side), and the top-`rerank` shortlist re-scores with
    * exact distances. At 100 TB: the corpus is encoded ONCE (cell id +
    * m-byte code per row, a ~25x storage cut at dim=64/m=8), a query
    * reads nprobe/c of the codes and exactly `rerank` float vectors.
    *
    * Each corpus row lives in one cell, so a (query, corpus) pair is
    * scored at most once — no dedup pass, same as [[ivfTopK]]. */
  def ivfPqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, c: Int = 16, nprobe: Int = 4, m: Int = 8, ks: Int = 64,
      rerank: Int = 100, iters: Int = 2, seed: Long = 42L,
      spill: Int = 1): DataFrame = {
    val cents = trainIvfCentroids(corpus, corpusVec, c, iters, seed = seed)
    val cb = trainPqCodebooks(corpus, corpusVec, m, ks, seed = seed)
    // corpus: PQ codes + cell id(s) (both scan-side; joined on the id
    // — in a deployed index this pair is the stored, encoded table).
    // spill > 1 multi-assigns rows to their top-spill cells (see
    // ivfTopK) — the ADC score of a pair is identical in every cell,
    // so duplicates collapse via min before the shortlist window.
    val cellOf =
      if (spill <= 1)
        corpus.select(col(corpusId), nearestCell(col(corpusVec), cents).as("__cell"))
      else
        corpus.select(col(corpusId),
            probeCells(col(corpusVec), cents, spill).as("__probe"))
          .select(col(corpusId), col("__probe.i").as("__cell"))
    val encoded = pqEncode(corpus, corpusId, corpusVec, cb)
      .join(cellOf, Seq(corpusId))
    // queries: probed cells × flat s-major ADC LUT (one compiled
    // kernel, one deref per scored term)
    val qlut = queries
      .select(probeCells(col(queryVec), cents, nprobe).as("__probe"),
        col(queryId),
        graft.functions.PqFunctions.pq_adc_lut(col(queryVec), cb).as("__lut"))
      .select(col("__probe.i").as("__cell"), col(queryId), col("__lut"))
    val scored0 = encoded.join(broadcast(qlut), Seq("__cell"))
      .select(col(queryId), col(corpusId),
        sqrt((0 until m).map(s =>
          element_at(col("__lut"),
            element_at(col("codes"), s + 1) + (s * ks + 1))).reduce(_ + _)).as("approx_l2"))
    val scored = if (spill <= 1) scored0
      else scored0.groupBy(col(queryId), col(corpusId))
        .agg(min(col("approx_l2")).as("approx_l2"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("approx_l2"), col(corpusId))
    val shortlist = scored.withColumn("__rr", row_number().over(w))
      .filter(col("__rr") <= rerank)
      .select(col(queryId), col(corpusId))
    val exact = shortlist
      .join(corpus.select(col(corpusId), col(corpusVec)), Seq(corpusId))
      .join(broadcast(queries.select(col(queryId), col(queryVec))), Seq(queryId))
      .select(col(queryId), col(corpusId),
        l2_distance(col(corpusVec), col(queryVec)).as("l2"))
    val w2 = Window.partitionBy(col(queryId)).orderBy(col("l2"), col(corpusId))
    exact.withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col(queryId), col(corpusId),
        round(col("l2"), 6).as("l2"), col("rk").cast("long").as("rk"))
  }

  // ---------------- product quantization (PQ) ----------------

  /** Train PQ codebooks (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): the vector space is split
    * into `m` contiguous subspaces of dim/m dimensions and each
    * subspace gets its own `ks`-centroid k-means codebook.
    *
    * Training is driver-local over a bounded, deterministic
    * hash-ordered sample (the [[trainIvfCentroids]] pattern —
    * `sampleN` rows collected once, MBs regardless of corpus size);
    * Lloyd on a few-thousand-row sample converges in a handful of
    * iterations and keeps training off the 100 TB scan path. Init is
    * the first `ks` sample subvectors in hash order (deterministic).
    *
    * Returns codebooks(s)(c) = centroid c of subspace s (dsub doubles
    * each) — m×ks×dsub values, KBs on the driver. */
  def trainPqCodebooks(corpus: DataFrame, vecCol: String, m: Int, ks: Int,
      iters: Int = 8, sampleN: Int = 4096, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__h", xxhash64(to_json(col("__v")), lit(seed)))
      .orderBy(col("__h")).limit(sampleN)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ training: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"PQ: dim $dim must be divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val subs = sample.map(v => v.slice(s * dsub, (s + 1) * dsub))
      var cents = subs.distinct.take(ks)
      // pad degenerate subspaces (fewer distinct subvectors than ks)
      // by cycling the distinct set — empty cells keep their centroid
      val nDistinct = cents.length
      while (cents.length < ks) cents = cents :+ cents(cents.length % nDistinct)
      for (_ <- 0 until iters) {
        val sums = Array.fill(ks, dsub)(0.0)
        val counts = Array.fill(ks)(0L)
        subs.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            var d = 0.0; var j = 0
            while (j < dsub) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += x(j); j += 1 }
        }
        cents = Array.tabulate(ks)(c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(dsub)(j => sums(c)(j) / counts(c)))
      }
      cents
    }
  }

  /** Encode every corpus row as `m` codebook indices: (id, codes).
    * Pure scan-side expressions — each subspace slice is projected to
    * an attribute first (interpreted-HOF relayering rule), then the
    * argmin runs over `ks` codegen'd l2 kernels against literal
    * centroids. Storage: m small ints vs 4·dim float bytes — at
    * dim=128, m=8 that is a 64× smaller corpus to scan and shuffle,
    * the lever that lets an ANN sweep over 100 TB of raw vectors
    * read TBs instead. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    // ONE compiled argmin loop over the referenced codebook
    // ([[graft.functions.PqEncodeCodes]]) — the compositional m×ks
    // l2_distance expansion cost seconds of Catalyst/codegen time per
    // query at m=8, ks=64; values are bit-identical (same kernel
    // arithmetic, same first-tie argmin)
    corpus.select(col(idCol),
      graft.functions.PqFunctions.pq_encode(col(vecCol), codebooks).as("codes"))

  /** PQ ANN top-k via asymmetric distance computation (ADC): the
    * corpus is encoded ONCE to m-byte codes (scan-side, no shuffle);
    * each query precomputes an m×ks lookup table of squared
    * sub-distances to every codebook centroid (m·ks codegen'd l2
    * kernels on the tiny broadcast side); scoring a corpus row is
    * then m array lookups + a sum — no float vector is touched on
    * the big side at all. approx_l2 = √(Σ_s lut[s][code_s]).
    *
    * This is the memory-bound regime's answer (vs [[ivfTopK]]'s
    * compute-bound cell pruning); real systems compose them (IVF-PQ)
    * — here the operators compose the same way: pass an
    * ivf-bucketed corpus in. */
  /** `rerank` > 0 switches on the standard ADC+R refinement (Jégou et
    * al. §VI): the compressed-domain scan keeps a top-`rerank`
    * shortlist per query, and only those rows are re-scored with the
    * EXACT distance (a join back to the float vectors — `rerank` x
    * |queries| rows, trivial at any corpus size). On weakly-clustered
    * corpora the true neighbors are separated from the bulk but
    * tightly spaced among themselves, which few-bit codes cannot rank —
    * measured recall@5 on the full-SF embeddings table: 0.05 pure ADC
    * at m=4/ks=16 vs 0.9+ at m=8/ks=64 with rerank=200 (a numpy
    * reference implementation reproduces both numbers, so this is the
    * data's isotropy, not an encoder defect; tracked per round in
    * BENCH_FULL.json). Output then carries exact `l2` instead of
    * `approx_l2`. */
  def pqTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, m: Int = 4, ks: Int = 16, iters: Int = 8,
      seed: Long = 42L, rerank: Int = 0): DataFrame = {
    val cb = trainPqCodebooks(corpus, corpusVec, m, ks, iters, seed = seed)
    val encoded = pqEncode(corpus, corpusId, corpusVec, cb)
    // query side: flat s-major ADC LUT — one compiled kernel
    val qlut = queries.select(col(queryId),
      graft.functions.PqFunctions.pq_adc_lut(col(queryVec), cb).as("__lut"))
    val scored = encoded.crossJoin(broadcast(qlut))
      .select(col(queryId), col(corpusId),
        sqrt((0 until m).map(s =>
          element_at(col("__lut"),
            element_at(col("codes"), s + 1) + (s * ks + 1))).reduce(_ + _)).as("approx_l2"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("approx_l2"), col(corpusId))
    if (rerank <= 0) {
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col(queryId), col(corpusId),
          round(col("approx_l2"), 6).as("approx_l2"), col("rk").cast("long").as("rk"))
    } else {
      val shortlist = scored.withColumn("__rr", row_number().over(w))
        .filter(col("__rr") <= rerank)
        .select(col(queryId), col(corpusId))
      val exact = shortlist
        .join(corpus.select(col(corpusId), col(corpusVec)), Seq(corpusId))
        .join(broadcast(queries.select(col(queryId), col(queryVec))), Seq(queryId))
        .select(col(queryId), col(corpusId),
          l2_distance(col(corpusVec), col(queryVec)).as("l2"))
      val w2 = Window.partitionBy(col(queryId)).orderBy(col("l2"), col(corpusId))
      exact.withColumn("rk", row_number().over(w2))
        .filter(col("rk") <= k)
        .select(col(queryId), col(corpusId),
          round(col("l2"), 6).as("l2"), col("rk").cast("long").as("rk"))
    }
  }

  /** Symmetric int8 vector quantization — the storage/bandwidth lever
    * of a 100 TB embedding corpus: 4× smaller than float32 (so 4×
    * more vectors per executor page and per shuffle byte) at ~0.4%
    * max component error, which top-k cosine ranking tolerates
    * (recall asserted in SimilaritySpec).
    *
    * Per-vector scale = max|x| / 127; codes = ⌊x/scale + 0.5⌋ (the
    * explicit floor(+0.5) pins rounding semantics across engines —
    * the oracle recomputes codes bit-for-bit in DuckDB). Zero vectors
    * quantize to all-zero codes with scale 0. Scan-side Column
    * expressions only — no shuffle, no UDF. */
  def quantizeInt8(vec: Column): Column =
    quantizeInt8(vec, int8Scale(vec))

  /** Per-vector quantization scale = max|x| / 127. HOT-PATH callers
    * must project this to an attribute and use the two-arg
    * [[quantizeInt8]]: the code lambda divides by the scale, and an
    * interpreted transform() re-evaluates a closed-over O(d) subtree
    * PER ELEMENT — O(d^2) per row with the fused single-arg form. */
  def int8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(0.0)) / 127.0

  def quantizeInt8(vec: Column, scale: Column): Column =
    struct(
      when(scale === 0.0, transform(vec, _ => lit(0).cast("int")))
        .otherwise(transform(vec, x =>
          floor(x.cast("double") / scale + 0.5).cast("int"))).as("codes"),
      scale.as("scale"))

  /** Reconstruct the float vector from (codes, scale). */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))
}
