package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * The reference's dedup surface is PRIMARY/UNIQUE key tables
  * (`fe/fe-parser/.../KeysType.java`) — exact dedup at ingest. The
  * fuzzy family (MinHash/SimHash/n-gram Jaccard/embedding cosine) is
  * the standard LLM-corpus extension built on the same engine
  * primitives (hash, groupBy, join).
  *
  * Scale design: every method is shuffle-bounded —
  *  - exact: one hash aggregation on the dedup key;
  *  - minhash-LSH: signatures are computed scan-side (codegen'd
  *    higher-order functions, no UDF), candidates only materialize
  *    within LSH bands (shuffle keyed by (band, signature) — skew-safe
  *    because a band bucket caps at near-duplicate cluster size);
  *  - simhash: 64-bit signature, banded by 16-bit chunks;
  *  - embedding: cosine pairs restricted to LSH buckets (see
  *    Similarity) or exact hash of quantized vectors.
  * Nothing does an all-pairs cross join.
  */
object Dedup {

  /** Exact dedup: keep one row per key (lowest orderBy value) —
    * equivalent to reading a PRIMARY KEY table merge-on-read. */
  def exact(df: DataFrame, keys: Seq[String], orderBy: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderBy))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Incremental exact dedup: a NEW batch against the STANDING corpus —
    * the continuous-ingestion pattern (the reference dedups on ingest
    * via PRIMARY KEY upsert, `KeysType.java` PRIMARY_KEYS; this is the
    * content-addressed equivalent keyed on the normalized-text
    * fingerprint). The batch first collapses internally (lowest id per
    * fingerprint wins, deterministic), then anti-joins the corpus's
    * fingerprint set. Only fingerprints cross the wire for the corpus
    * side — 8 bytes/doc, the compact state a 100 TB corpus carries
    * between ingestion runs — and both steps key on the fingerprint so
    * the exchange is reused. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    batch.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(corpus.select(TextAnalysis.fingerprint(col(textCol)).as("__fp")),
        Seq("__fp"), "left_anti")
      .drop("__fp", "__rn")
  }

  /** MinHash signature: for seed i, min over shingles of
    * xxhash64(seed_i, shingle).
    *
    * PERFORMANCE: higher-order functions run interpreted (no codegen),
    * and an interpreted lambda re-evaluates any non-attribute subtree
    * it closes over PER ELEMENT. Pass an *attribute* (a projected
    * column), never an inline `wordShingles(...)` expression — the
    * expression would be duplicated `numHashes` times and re-computed
    * per hash. Single pass here: one transform to per-shingle hash
    * seeds, then numHashes array_mins over that attribute-sized array. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleArr, s => xxhash64(lit(i), s)))
    }: _*)

  /** MinHash signatures via explode + min-aggregation — the codegen
    * path (same rewrite simhashSignatures got): per (id, shingle) row
    * the numHashes xxhash64 calls are ordinary codegen'd projections,
    * and the per-id mins combine map-side before one shuffle on id.
    * The `minhashSignature` Column formulation above runs numHashes
    * interpreted `transform` lambdas per row instead — identical
    * values (asserted in DedupSpec), ~3× slower end to end.
    * explode_outer + the isNotNull guard preserve the all-null
    * signature that empty documents get from array_min(empty). */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int): DataFrame = {
    // NOT fanned out: spreading the HOF shingling would shuffle raw
    // document text (the guide §8 anti-pattern — move heavy bytes to
    // spread CPU); measured net-negative on the full-SF minhash gate
    // (+1.0 s) vs the planted gate's -0.5 s. The explode's output
    // parallelizes at the groupBy exchange regardless.
    val exploded = df.select(col(idCol).as("__id"),
      explode_outer(wordShingles(col(textCol), shingleSize)).as("__s"))
    val mins = (0 until numHashes).map(i =>
      min(when(col("__s").isNotNull, xxhash64(lit(i), col("__s")))).as(s"__m$i"))
    exploded.groupBy(col("__id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("__id"), array((0 until numHashes).map(i => col(s"__m$i")): _*).as("__sig"))
  }

  /** MinHash + LSH near-duplicate PAIRS: returns (id_a, id_b,
    * n_shared_bands) for candidates sharing >= 1 band, with ids
    * ordered a < b. bands * rowsPerBand must == numHashes.
    *
    * SUPER-SPREADER guard (`bucketCap`): the bucket self-join is
    * quadratic in bucket size, and a corpus with a large
    * mutual-near-duplicate cluster (boilerplate, templated pages,
    * replicated shards) lands the whole cluster in one bucket per
    * band — the sf10 decade probe measured 27.5× wall for 10× docs
    * from exactly this (SCALING.md round-8). Buckets above the cap
    * switch to STAR pairing: each member pairs with the bucket's
    * MIN id only — O(|bucket|) pairs. Under the keep-lowest-id dedup
    * contract the star is semantics-preserving for genuine clusters
    * (every member verifies against the representative, and the
    * representative is the id [[minhashDedup]] would keep); what it
    * forgoes is member↔member pairs inside an over-cap bucket whose
    * members are NOT all similar to the min — LSH false positives in
    * degenerate buckets, the accepted trade every production LSH
    * dedup makes. Below the cap the exact all-pairs join runs
    * unchanged. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4,
      bucketCap: Int = 64): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(rowsPerBand * bands == numHashes, "bands must divide numHashes")
    require(bucketCap >= 2, s"bucketCap=$bucketCap cannot form pairs")
    val sig = minhashSignatures(df, idCol, textCol, shingleSize, numHashes)
    // explode band signatures: band index + hash of that band's slice
    val banded0 = sig.select(col("__id"), posexplode(
      array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rowsPerBand).map(r => col("__sig")(b * rowsPerBand + r)): _*))
      }: _*))).withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bandsig")
    // one window pass tags bucket size + the bucket representative —
    // same shuffle key as the join, no extra exchange shape
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__band"), col("__bandsig"))
    val banded = banded0
      .withColumn("__bn", count(lit(1)).over(w))
      .withColumn("__brep", min(col("__id")).over(w))
    val small = banded.filter(col("__bn") <= bucketCap)
    val l = small.select(col("__band"), col("__bandsig"), col("__id").as("id_a"))
    val r = small.select(col("__band"), col("__bandsig"), col("__id").as("id_b"))
    val exact = l.join(r, Seq("__band", "__bandsig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val starred = banded.filter(col("__bn") > bucketCap &&
        col("__id") =!= col("__brep"))
      .select(col("__brep").as("id_a"), col("__id").as("id_b"))
    exact.unionByName(starred)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Word n-gram shingles joined back to strings (helper).
    *
    * Built as a chain of `zip_with(acc, slice(words, k, ...), concat)`
    * sliding windows: every `split`/`slice` is a CHILD of a
    * higher-order function (evaluated once per row), never inside a
    * lambda body (which interpreted HOFs re-evaluate per element —
    * the naive `element_at(words, i+j)` formulation costs O(len)
    * regex splits per row). zip_with pads the shorter side with null
    * and `concat` null-propagates, so trailing partial windows drop
    * out in the final filter. */
  def wordShingles(text: Column, n: Int): Column = {
    // empty-string words appear when text is empty or has edge
    // whitespace (split semantics) — drop them before shingling
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val grams = (2 to n).foldLeft(words) { (acc, k) =>
      zip_with(acc, slice(words, lit(k), greatest(size(words) - (k - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(grams, c => c.isNotNull))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs (verify stage
    * after LSH): |A ∩ B| / |A ∪ B| over word n-grams. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** MinHash-LSH dedup end to end: candidates → Jaccard verify →
    * keep the lowest id of each near-duplicate group. */
  def minhashDedup(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleSize: Int = 3,
      numHashes: Int = 16, bands: Int = 4,
      bucketCap: Int = 64): DataFrame = {
    // Candidate pairs fan out three ways below (both candIds union
    // branches + the verify join); localCheckpoint materializes the
    // full shingle→minhash→LSH pipeline ONCE instead of relying on
    // exchange reuse to cover 3 re-executions. Pair count is bounded
    // by band collisions (near-dup clusters), a small fraction of the
    // corpus — cheap to pin.
    val pairs = minhashLshPairs(df, idCol, textCol, shingleSize, numHashes,
        bands, bucketCap)
      .localCheckpoint(true)
    // Verify needs shingles only for ids that appear in a candidate pair
    // (a small fraction of the corpus); semi-join prune BEFORE the
    // shingle computation so the interpreted HOF chain runs over
    // candidates, not the whole corpus — and not once per join branch.
    val candIds = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    // pinned: the verify join consumes the candidate shingles for BOTH
    // pair sides — unpinned, the semi-join + HOF shingling ran twice
    // (bounded by candidate ids, a small fraction of the corpus)
    val sh = df.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol).as("__vid"), wordShingles(col(textCol), shingleSize).as("__sh"))
      .localCheckpoint(true)
    val verified = pairs
      .join(sh.withColumnRenamed("__vid", "id_a").withColumnRenamed("__sh", "__sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("__vid", "id_b").withColumnRenamed("__sh", "__sh_b"), Seq("id_b"))
      .filter(jaccard(col("__sh_a"), col("__sh_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    // drop every id that has a smaller near-duplicate partner
    val losers = verified.select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash from word hashes — weighted sign aggregation over
    * the 64 bit positions, composed from higher-order functions.
    * (ShiftRight/ShiftLeft built directly as Catalyst expressions —
    * the Scala functions API only exposes Int shifts.)
    *
    * Single pass over the words: fold word hashes into a 64-wide
    * counter array (`zip_with` inside the fold touches only lambda
    * variables), then collapse signs to bits. The per-bit formulation
    * (64 aggregates, each closing over the hash array expression)
    * re-evaluates split+xxhash 64× per row under interpreted HOFs. */
  @deprecated("interpreted-HOF formulation kept as a tested reference; " +
    "use simhashSignatures (codegen'd explode+sum) on anything big", "0.2")
  def simhash64(text: Column): Column = {
    val hashes = transform(filter(split(text, "\\s+"), w => w =!= ""), w => xxhash64(w))
    simhashFromHashes(hashes)
  }

  /** SimHash from a word-hash array. For the fast path pass an
    * ATTRIBUTE column (projected `transform(split(..), xxhash64)`),
    * so the 64 per-bit folds below each iterate a materialized array
    * of longs — pure shift/add per element, no per-element array
    * allocation. (An inline expression argument would be re-evaluated
    * by every fold: interpreted-HOF rule, see minhashSignature.) */
  def simhashFromHashes(hashes: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => C, expression => E}
    import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
    def shr(a: Column, b: Int) = C(ShiftRight(E(a), E(lit(b))))
    // bit b set in result iff words-with-bit > words-without: the fold
    // counts +1/-1 per word with plain long arithmetic
    val bits = (0 until 64).map { b =>
      val cnt = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shr(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(cnt > 0, lit(1L << b)).otherwise(0L)
    }
    bits.reduce((a, v) => a.bitwiseOR(v))
  }

  /** SimHash signatures as a DataFrame op: explode words, hash, then
    * 64 codegen'd conditional sums in one hash aggregation — the whole
    * computation stays inside whole-stage codegen (the Column
    * formulations above run interpreted). Scale shape: partial
    * aggregation collapses each document's words map-side before any
    * shuffle, so the exchange carries one 64-column row per doc. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df
      .select(col(idCol).as("__id"), explode(split(col(textCol), "\\s+")).as("__w"))
      .filter(col("__w") =!= "")
      .select(col("__id"), xxhash64(col("__w")).as("__h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"__b$b")
    }
    val folded = words.groupBy(col("__id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("__id"),
        (0 until 64).map(b => when(col(s"__b$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ bitwiseOR _).as("__sig"))
    // docs with no words (empty text) have the all-zero signature
    df.select(col(idCol).as("__id")).join(folded, Seq("__id"), "left_outer")
      .select(col("__id"), coalesce(col("__sig"), lit(0L)).as("__sig"))
  }

  /** SimHash near-dup candidate pairs: band the 64-bit signature into
    * 4 × 16-bit chunks; pairs sharing any chunk are candidates, then
    * verified by Hamming distance <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // both self-join sides consume the signatures; pin them (one
    // 64-bit sig per doc) so tokenize+fold runs once, not twice
    val sigs = simhashSignatures(df, idCol, textCol).localCheckpoint(true)
    val banded = sigs.select(col("__id"), col("__sig"), posexplode(array(
      (0 until 4).map(b => shiftright(col("__sig"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__chunk")
    val l = banded.select(col("__band"), col("__chunk"), col("__id").as("id_a"), col("__sig").as("__sig_a"))
    val r = banded.select(col("__band"), col("__chunk"), col("__id").as("id_b"), col("__sig").as("__sig_b"))
    l.join(r, Seq("__band", "__chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sig_a").bitwiseXOR(col("__sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-duplicates: exact duplicates via quantized-vector
    * hash, near-duplicates via cosine >= threshold within LSH buckets
    * (delegates to Similarity.lshBuckets). */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, planes: Int = 12, seed: Long = 42L): DataFrame = {
    // both self-join sides consume the bucket assignment; pin it so
    // the hyperplane projections run once (one bucket id per vector)
    val bucketed = Similarity.withLshBucket(df, vecCol, planes, seed)
      .localCheckpoint(true)
    val l = bucketed.select(col("__bucket"), col(idCol).as("id_a"), col(vecCol).as("__v_a"))
    val r = bucketed.select(col("__bucket"), col(idCol).as("id_b"), col(vecCol).as("__v_b"))
    l.join(r, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions.cosine_similarity(col("__v_a"), col("__v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499):
    * find every maximal token span whose `width`-token windows all
    * occur more than once in the corpus. Lee et al. build a suffix
    * array; the scalable Spark shape is fixed-minimum-match-length
    * window hashing — every `width`-token window is hashed scan-side
    * (one explode, ~tokens rows, same cost class as shingling), a
    * corpus-wide groupBy finds hashes with count > 1, and duplicated
    * window positions are merged per doc into maximal spans with a
    * gaps-and-islands window. The only corpus-scale shuffle is the
    * window-hash groupBy (8-byte keys); span merging shuffles only
    * the duplicated positions.
    *
    * Returns (id, span_start, span_end, n_windows): 1-based token
    * positions, span_end inclusive; a span of n_windows w-windows
    * covers span_end - span_start + 1 = n_windows + w - 1 tokens. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tokenize + per-window slice/hash is interpreted-HOF CPU; spread
    // a degenerate single-split scan first, and PIN the window table —
    // the duplicate-hash aggregate and the span join both consume it,
    // so unpinned it is computed twice (window count ≈ token count,
    // bounded; the shape a 100 TB substring dedup materializes anyway)
    val ws = Ops.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextAnalysis.normWords(col(textCol)).as("__ws"))
    val wins = ws.filter(size(col("__ws")) >= width)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__ws")) - (width - 1)),
        i => struct(i.as("pos"),
          xxhash64(array_join(slice(col("__ws"), i, lit(width)), " ")).as("h")))).as("w"))
      .select(col(idCol), col("w.pos").as("pos"), col("w.h").as("h"))
      .localCheckpoint(true)
    val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("h"))
    val islands = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    wins.join(dup, Seq("h"))
      .withColumn("__grp", col("pos") - row_number().over(islands))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + width - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__grp")
  }

  /** SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs via
    * k-means partitioning — cluster the embedding corpus with
    * full-corpus Lloyd ([[Similarity.kMeansTrain]]), then compare
    * pairs only WITHIN a cluster (cosine >= threshold). With k sized
    * so clusters hold ~corpus/k rows, the self-join is k independent
    * blocks instead of one all-pairs product — the same
    * candidate-bounding role LSH buckets play in
    * [[embeddingDupPairs]], but driven by learned structure, so
    * semantically-close pairs that straddle random hyperplanes are
    * still co-clustered. Scale-invariant vectors (exact copies,
    * rescales) always share a cluster: cosine argmax ignores norm.
    *
    * SUPER-CELL guard (`cellCap`): the within-cell self-join is
    * quadratic in cell size, and k-means has no size contract — a
    * corpus whose embeddings collapse onto one mode (boilerplate,
    * near-constant vectors) lands most rows in ONE cell and the
    * "bounded" join degenerates toward all-pairs (the same failure
    * minhash buckets had before round 8's star fix). Cells above the
    * cap switch to STAR pairing: each member scores against the
    * cell's MIN-id representative only — O(|cell|) pairs. Under the
    * keep-lowest-id dedup contract the star preserves genuine
    * semantic clusters (every member verifies against the id
    * [[semanticDedup]] would keep); what it forgoes is member↔member
    * pairs inside an over-cap cell whose members are close to each
    * other but NOT to the representative — the accepted LSH-style
    * trade. Below the cap the exact all-pairs join runs unchanged. */
  def semanticDupPairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double = 0.95, iters: Int = 3,
      seed: Long = 42L, cellCap: Int = 1024): DataFrame = {
    require(cellCap >= 2, s"cellCap=$cellCap cannot form pairs")
    val assigned = Similarity.kMeans(df, idCol, vecCol, k, iters, seed)
      .select(col("cell"), col(idCol), col(vecCol))
    // one window pass tags cell size + the cell representative —
    // same shuffle key as the join, no extra exchange shape
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
    val tagged = assigned
      .withColumn("__cn", count(lit(1)).over(w))
      .withColumn("__crep", min(col(idCol)).over(w))
    val cos = graft.functions.VectorFunctions.cosine_similarity _
    val small = tagged.filter(col("__cn") <= cellCap)
    val l = small.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("__v_a"))
    val r = small.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("__v_b"))
    val exact = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cos(col("__v_a"), col("__v_b")).as("cos"))
    val fat = tagged.filter(col("__cn") > cellCap)
    val reps = fat.filter(col(idCol) === col("__crep"))
      .select(col("cell"), col(vecCol).as("__v_rep"))
    val starred = fat.filter(col(idCol) =!= col("__crep"))
      .join(reps, Seq("cell"))
      .select(col("__crep").as("id_a"), col(idCol).as("id_b"),
        cos(col("__v_rep"), col(vecCol)).as("cos"))
    exact.unionByName(starred).filter(col("cos") >= threshold)
  }

  /** Semantic dedup: SemDeDup pairs → connected components → keep the
    * min-id representative per semantic cluster (plus all unpaired
    * rows). The corpus-curation form of [[semanticDupPairs]]. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double = 0.95, iters: Int = 3,
      seed: Long = 42L, cellCap: Int = 1024): DataFrame = {
    val pairs = semanticDupPairs(df, idCol, vecCol, k, threshold, iters,
      seed, cellCap)
    dedupByPairs(df, idCol, pairs, "id_a", "id_b")
  }

  /** Connected components over a duplicate-pair graph → (id, comp)
    * where comp is the MINIMUM id in the component. This is the step
    * between pair discovery (minhash/simhash/embedding *Pairs above)
    * and corpus dedup: near-dup relations are not transitive-closed
    * by the pair emitters, so "keep one per pair" under-deletes — the
    * pipeline needs one representative per CLUSTER.
    *
    * Algorithm: min-label propagation with pointer doubling. Each
    * round every node takes the min label among itself and its
    * neighbors (the standard MapReduce CC), then labels are jumped
    * through themselves (comp ← label(comp)) — the large-star/
    * small-star-style shortcut that collapses a chain of length L in
    * O(log L) rounds instead of L. Two joins + one aggregation
    * shuffle per round; near-dup graphs are dense clique-ish
    * clusters, so 2-3 rounds typical, and maxIter=20 covers
    * diameters up to ~2^20 even on adversarial chains.
    * localCheckpoint truncates the per-round lineage so the plan
    * doesn't grow with iterations. The per-round `count` is a
    * convergence ACTION on aggregated counts, not a driver-side
    * collect of data rows. Throws if maxIter is exhausted before
    * convergence — unconverged labels would silently under-delete
    * duplicates downstream.
    */
  def connectedComponents(
      edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    // materialize the symmetrized edge list ONCE: `sym` is referenced
    // by every round's join, and edge lists arrive with expensive
    // lineages (minhash banding, k-means cluster self-joins) — without
    // the checkpoint each round would recompute the whole pair
    //-discovery pipeline (measured 3-8x the total dedup cost)
    val sym = Pins.loopPin(
      edges.select(col(src).cast("long").as("s"), col(dst).cast("long").as("d"))
        .union(edges.select(col(dst).cast("long").as("s"), col(src).cast("long").as("d"))))
    var labels = Pins.loopPin(sym.select(col("s").as("id")).distinct()
      .withColumn("comp", col("id")))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.join(labels.withColumnRenamed("id", "s"), "s")
        .groupBy(col("d").as("id")).agg(min("comp").as("nbrComp"))
      val viaNbr = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbrComp"), col("comp"))).as("comp"))
      // pointer doubling: follow the label pointer one hop (every label
      // is itself a node id, so label(comp) always exists)
      val stepped = Pins.loopPin(viaNbr
        .join(viaNbr.select(col("id").as("comp"), col("comp").as("comp2")), Seq("comp"))
        .select(col("id"), col("old"), least(col("comp"), col("comp2")).as("comp")))
      changed = stepped.filter(col("comp") < col("old")).count()
      labels = stepped.select("id", "comp")
      i += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "(still-shrinking labels would yield split components and under-deletion); " +
        "raise maxIter")
    labels
  }

  /** Corpus dedup by cluster: one representative (min id) per
    * connected component of the pair graph; rows not in any pair are
    * kept as their own representative. */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val comps = connectedComponents(pairs, srcCol, dstCol)
    df.join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("comp").isNull || col("comp") === col(idCol))
      .drop("comp")
  }
}
