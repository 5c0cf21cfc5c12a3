package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed n-gram language-model perplexity scoring — the
  * CCNet-shape corpus quality filter (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data",
  * LREC 2020): documents whose token stream the reference LM finds
  * surprising (high perplexity) get dropped or routed to a lower
  * quality bucket. CCNet scores with a pre-trained KenLM binary; here
  * BOTH phases are in-engine and Spark-shaped — the model is a bigram
  * count table TRAINED distributedly over a reference slice, and
  * scoring is pure joins + codegen'd arithmetic. No model binary, no
  * UDF, no driver state.
  *
  * Model: add-k–smoothed bigram LM over the standard analyzer's token
  * stream (same tokenizer as [[InvertedIndex.tokens]], so MATCH,
  * BM25 and the LM agree on tokenization):
  *
  *   p(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)
  *   ppl(doc)   = exp( − mean over doc bigrams of ln p(w2|w1) )
  *
  * where c(w1) counts w1 as a bigram HEAD in the training slice and V
  * is the training vocabulary size — so rows of the bigram table sum
  * to a proper conditional per head even under smoothing.
  *
  * Scale shape (100 TB corpus):
  *  - training is two map-side-combining aggregations over an
  *    explode — shuffle width is (w1,w2) and w1, never the corpus;
  *  - the model is DATA, not driver state: the bigram table joins on
  *    (w1,w2) — a plain shuffle join that AQE can bucket/skew-handle;
  *    the head table and the 1-row vocab count are broadcast;
  *  - `minCount` prunes the bigram tail (CCNet's model compaction):
  *    pruned pairs fall back to the smoothed unseen probability, and
  *    the model table shrinks by orders of magnitude;
  *  - scoring never rescans training data — persist the two count
  *    tables (e.g. `Colocate.saveBucketed` on w1) and reuse.
  */
object LanguageModel {

  /** A trained bigram LM: `heads` = (w1, c1), `bigrams` =
    * (w1, w2, c12), `vocab` = single row (v). All three are lazy
    * DataFrames — training cost is paid when scoring runs. */
  final case class BigramLm(heads: DataFrame, bigrams: DataFrame, vocab: DataFrame)

  /** Consecutive-token bigram structs (w1, w2) of the standard
    * analyzer's stream; empty array for docs with < 2 tokens. */
  def bigrams(text: Column): Column = {
    val ts = InvertedIndex.tokens(text)
    val n = greatest(size(ts) - 1, lit(0))
    zip_with(slice(ts, lit(1), n), slice(ts, lit(2), n),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  /** Train the bigram model on `docs(textCol)`. `minCount` drops
    * bigram rows with c12 < minCount (head counts and V stay exact,
    * so pruned pairs score exactly like unseen pairs). */
  def train(docs: DataFrame, textCol: String, minCount: Long = 1L): BigramLm = {
    val pairs = docs
      .select(explode(bigrams(col(textCol))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigs = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val heads = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = docs
      .select(explode(InvertedIndex.tokens(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    BigramLm(heads, bigs, vocab)
  }

  /** Per-document perplexity under the model: (id, n_bigrams, ppl),
    * ppl rounded to 4 dp so an independent recompute reproduces it.
    * Docs with < 2 tokens have no bigrams and are absent from the
    * output (perplexity undefined). */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      lm: BigramLm, k: Double = 0.5): DataFrame = {
    val pairs = docs
      .select(col(idCol), explode(bigrams(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    pairs
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(broadcast(lm.heads), Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocab))
      .select(col(idCol),
        log((coalesce(col("c12"), lit(0L)) + lit(k)) /
            (coalesce(col("c1"), lit(0L)) + lit(k) * col("v"))).as("logp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("logp"))), 4).as("ppl"))
  }

  /** Token-distribution drift between two corpus slices — the
    * monitoring signal for data mixing: KL(P‖Q), KL(Q‖P) and the
    * symmetric bounded Jensen-Shannon divergence over add-k–smoothed
    * unigram distributions on the UNION vocabulary.
    *
    *   p(w) = (c_A(w) + k) / (N_A + k·V),  same for q;  m = (p+q)/2
    *   JS   = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m)
    *
    * One full-outer join of two map-side-combined count tables plus a
    * single global agg — no driver state, shuffle width = vocab.
    * Returns one row (kl_pq, kl_qp, js), rounded to 6 dp. */
  def distributionDivergence(docsA: DataFrame, docsB: DataFrame,
      textCol: String, k: Double = 0.5): DataFrame = {
    def counts(df: DataFrame) = df
      .select(explode(InvertedIndex.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ca = counts(docsA).withColumnRenamed("c", "ca")
    val cb = counts(docsB).withColumnRenamed("c", "cb")
    val joined = ca.join(cb, Seq("w"), "full_outer")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    joined.crossJoin(broadcast(tot))
      .select(
        ((col("ca") + lit(k)) / (col("na") + lit(k) * col("v"))).as("p"),
        ((col("cb") + lit(k)) / (col("nb") + lit(k) * col("v"))).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .agg(
        round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl_pq"),
        round(sum(col("q") * log(col("q") / col("p"))), 6).as("kl_qp"),
        round(sum(col("p") * log(col("p") / col("m")) / 2 +
          col("q") * log(col("q") / col("m")) / 2), 6).as("js"))
  }
}
