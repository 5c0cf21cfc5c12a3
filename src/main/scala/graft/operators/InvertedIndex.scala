package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text MATCH over an inverted index.
  *
  * Reference: the GIN/inverted-index predicate path —
  * `be/src/storage_primitive/inverted_index_iterator.h` (indexed
  * evaluation), `be/src/storage/column_predicate_inverted_index_fallback.h`
  * (unindexed fallback), tokenizers in `be/src/exprs/gin_functions.cpp`.
  *
  * Spark mapping: the index IS a postings table — (term, doc_id, tf)
  * rows produced by the same tokenizer the `tokenize` SQL function
  * exposes. A MATCH predicate rewrites to a semi-join of the doc table
  * against the postings filtered to the query terms; ranking is an
  * aggregation over the same filtered postings.
  *
  * Scale design (100 TB corpus):
  *  - the postings build is one explode + one map-side-combining
  *    aggregation — no shuffle wider than (term, doc);
  *  - persist postings WITH `Colocate.saveBucketed(..., "term", n)`:
  *    a MATCH then reads only the query terms' buckets (term-pruned
  *    scan ≈ the reference seeking a posting list) instead of the
  *    corpus;
  *  - `term IN (query terms)` is a pushable parquet filter, so even
  *    unbucketed postings scan only matching row groups;
  *  - the doc-side join is a semi-join on doc ids (bounded by the
  *    posting hits, not the corpus), and the tiny hit set broadcasts.
  * The fallback path (no index) is the same predicate as scan-side
  * expressions: `arrays_overlap`/`array_except` over `tokens(text)` —
  * codegen'd, no UDF — mirroring the reference's fallback predicate.
  */
object InvertedIndex {

  /** StandardAnalyzer-style tokens: lowercase, alphanumeric runs.
    * Matches the `tokenize('standard', ...)` SQL function. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** Build the postings table (term, doc_id, tf). */
  def build(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Docs matching ANY query term (semi-join against pruned postings). */
  def matchAny(docs: DataFrame, postings: DataFrame, idCol: String,
      terms: Seq[String]): DataFrame = {
    val hits = postings.filter(col("term").isin(terms: _*))
      .select(col("doc_id").as(idCol)).distinct()
    docs.join(hits, Seq(idCol), "left_semi")
  }

  /** Docs matching ALL query terms: pruned postings grouped by doc,
    * kept when every distinct term matched. */
  def matchAll(docs: DataFrame, postings: DataFrame, idCol: String,
      terms: Seq[String]): DataFrame = {
    val need = terms.distinct
    val hits = postings.filter(col("term").isin(need: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__nt")) // postings are distinct per (term, doc)
      .filter(col("__nt") === need.size)
      .select(col("doc_id").as(idCol))
    docs.join(hits, Seq(idCol), "left_semi")
  }

  /** Top-k docs matching ALL query terms, ranked by total term
    * frequency (ties broken by doc id — deterministic output).
    * orderBy+limit first so the cut plans as TakeOrderedAndProject
    * (per-partition heaps, k rows to the driver-side merge); the
    * rank window then runs over k rows, not the hit set. */
  def matchTopK(postings: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val need = terms.distinct
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    postings.filter(col("term").isin(need: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__nt"), sum(col("tf")).as("score"))
      .filter(col("__nt") === need.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("score"),
        row_number().over(w).cast("long").as("rk"))
  }

  /** BM25-ranked top-k over the postings (Robertson/Sparck Jones;
    * the standard relevance ranking over the same inverted index the
    * MATCH predicates use — Lucene's default since 6.0).
    *
    *   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   score(d,q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avg))
    *
    * Scale shape: everything derives from term-pruned postings — the
    * per-term df aggregate is |terms| rows, the doc-length table is
    * built once from the full postings with one map-side-combining
    * aggregation (persist it alongside the postings in production),
    * and the corpus itself is never rescanned. The final cut is a
    * TakeOrderedAndProject. Scores are rounded to 4 dp so the
    * DuckDB oracle's independent ln/division reproduces them. */
  def bm25TopK(postings0: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val need = terms.distinct
    // pin the postings: the doc-length table and the term-pruned scan
    // both consume them — unpinned, the tokenize+explode+count
    // pipeline runs twice (the "persist it alongside the postings in
    // production" note above, applied)
    val postings = postings0.localCheckpoint(true)
    val docLen = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("len"))
    val nDocs = docLen.agg(count(lit(1)).as("n"), avg(col("len")).as("avg_len"))
    val pruned = postings.filter(col("term").isin(need: _*))
    val df = pruned.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val scored = pruned
      .join(broadcast(df), "term")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("norm",
        col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("len") / col("avg_len"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("idf") * col("norm")), 4).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("score"),
        row_number().over(w).cast("long").as("rk"))
  }

  /** Positional postings (term, doc_id, positions) — the phrase-query
    * index shape (Lucene-style position lists; the reference's GIN
    * index stores the same per-term occurrence lists). Positions are
    * 0-based token offsets, sorted. */
  def buildPositional(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("__pos"))).as("positions"))

  /** Phrase occurrences per doc from positional postings: query term i
    * at token position p contributes anchor p - i; a doc position where
    * ALL phrase terms align on one anchor is a phrase start.
    *
    * Work is bounded by the phrase terms' postings (term-pruned scan,
    * like every MATCH here), the phrase spec joins in as a broadcast
    * literal, and the anchor check is two map-side-combining
    * aggregations keyed by (doc, anchor) then doc. Duplicate terms in
    * the phrase ("buffalo buffalo") are handled by the spec join: one
    * posting row anchors once per spec entry. Returns (doc_id, n_hits),
    * n_hits >= 1. */
  def phraseHits(positional: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val terms = phrase.map(_.toLowerCase)
    val spark = positional.sparkSession
    val spec = spark.createDataFrame(terms.zipWithIndex.map {
      case (t, i) => (t, i.toLong)
    }).toDF("__term", "__i")
    positional.filter(col("term").isin(terms.distinct: _*))
      .select(col("doc_id"), col("term"), explode(col("positions")).as("__pos"))
      .join(broadcast(spec), col("term") === col("__term"))
      .select(col("doc_id"), (col("__pos") - col("__i")).as("__anchor"), col("__i"))
      .groupBy(col("doc_id"), col("__anchor"))
      .agg(countDistinct(col("__i")).as("__k"))
      .filter(col("__k") === terms.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Docs containing the exact phrase (consecutive, in order). */
  def matchPhrase(docs: DataFrame, positional: DataFrame, idCol: String,
      phrase: Seq[String]): DataFrame =
    docs.join(phraseHits(positional, phrase).select(col("doc_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Proximity (slop) match: docs where `a` and `b` occur within
    * `slop` token positions of each other, either order — the NEAR
    * operator of a full-text surface. Same term-pruned shape as
    * phraseHits; candidate pairs only materialize within a doc's two
    * posting lists. Returns (doc_id, n_pairs, min_dist). */
  def proximityHits(positional: DataFrame, a: String, b: String,
      slop: Int): DataFrame = {
    require(slop >= 1, "slop must be >= 1")
    require(a.toLowerCase != b.toLowerCase, "proximity terms must differ")
    val pa = positional.filter(col("term") === a.toLowerCase)
      .select(col("doc_id"), explode(col("positions")).as("__pa"))
    val pb = positional.filter(col("term") === b.toLowerCase)
      .select(col("doc_id"), explode(col("positions")).as("__pb"))
    pa.join(pb, Seq("doc_id"))
      .filter(abs(col("__pa") - col("__pb")) <= slop)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("__pa") - col("__pb"))).as("min_dist"))
  }

  /** Unindexed fallback predicates (the reference's fallback path):
    * scan-side codegen'd expressions over tokens(text). */
  def matchAnyPredicate(text: Column, terms: Seq[String]): Column =
    arrays_overlap(tokens(text), typedlit(terms.map(_.toLowerCase)))

  def matchAllPredicate(text: Column, terms: Seq[String]): Column =
    size(array_except(typedlit(terms.map(_.toLowerCase).distinct), tokens(text))) === 0

  /** L2-normalized TF-IDF term weights per document from the postings
    * table: w(t,d) = tf·ln(N/df) / ‖d‖. `maxDfRatio` drops terms
    * appearing in more than that fraction of documents BEFORE
    * weighting — the stopword cut that bounds the similarity join's
    * term fanout (a term with df=D generates D² candidate pairs). */
  def tfidfVectors(postings0: DataFrame, maxDfRatio: Double = 1.0): DataFrame = {
    // pin the postings: N, the per-term dfs, and the weighted rows all
    // consume them — without pinning each branch re-runs the tokenize+
    // explode+count pipeline (3 corpus passes; production engines
    // materialize the inverted index for the same reason)
    val postings = postings0.localCheckpoint(true)
    val n = postings.agg(countDistinct(col("doc_id")).as("n"))
    val dfs = postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val pruned = postings
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(n))
      .filter(col("df") <= col("n") * maxDfRatio)
      .withColumn("w0", col("tf") * log(col("n").cast("double") / col("df")))
    val norms = pruned.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w0") * col("w0"))).as("norm"))
    pruned.join(norms, "doc_id")
      .select(col("doc_id"), col("term"), (col("w0") / col("norm")).as("w"))
  }

  /** All-pairs document similarity over the inverted index: cosine of
    * L2-normalized TF-IDF vectors computed as a SPARSE dot product —
    * one term-keyed self-join, sum(wa·wb) per pair, top-k partners per
    * doc. This is the inverted-index similarity join (Bayardo et al.,
    * "Scaling Up All Pairs Similarity Search", WWW 2007): candidate
    * pairs exist ONLY for docs sharing a surviving term, so the
    * `maxDfRatio` stopword cut is the scale lever — without it one
    * df=N term makes the join quadratic in the corpus. Ranking uses
    * the 6-dp-rounded similarity (+ id tiebreak) so independent
    * engines order ulp-close sums identically. */
  def similarDocsTopK(postings: DataFrame, k: Int,
      maxDfRatio: Double = 0.5): DataFrame = {
    // both sides of the term-keyed self-join read the SAME weighted
    // vectors; pin them once instead of deriving the TF-IDF pipeline
    // twice (the pinned set is one row per surviving (doc, term))
    val v = tfidfVectors(postings, maxDfRatio).localCheckpoint(true)
    val a = v.select(col("doc_id").as("id_a"), col("term"), col("w").as("wa"))
    val b = v.select(col("doc_id").as("id_b"), col("term"), col("w").as("wb"))
    val sims = a.join(b, "term")
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(round(sum(col("wa") * col("wb")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("sim").desc, col("id_b"))
    sims.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("id_b"), col("sim"), col("rk").cast("long").as("rk"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: given N ranked lists
    * (each with columns idCol and `rk`), every appearance of a doc
    * contributes 1/(k0 + rank) and docs found by multiple retrievers
    * (e.g. BM25 AND vector ANN) rise to the top. Rank-only fusion —
    * no score calibration across retrievers is needed, which is why
    * RRF is the default in hybrid-search engines.
    *
    * Scale shape: the inputs are already top-k lists (bounded rows —
    * the expensive corpus-scale work happened inside the retrievers),
    * so the union + groupBy here is over N·k rows and the final
    * window runs over `topK` rows after a TakeOrderedAndProject cut.
    * Output: (idCol, rrf, n_lists, rk), rrf rounded to 6 dp. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
      k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val union = rankings
      .map(df => df.select(col(idCol), col("rk").cast("long").as("rk")))
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf").desc, col(idCol))
    union.groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (lit(k0) + col("rk"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol)).limit(topK)
      .select(col(idCol), col("rrf"), col("n_lists"),
        row_number().over(w).cast("long").as("rk"))
  }
}
