package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All column expressions compose Spark built-ins (codegen'd, no UDF)
  * so they run scan-side at full width — the shape that matters when
  * the documents table is 100 TB.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword-ratio
    * language heuristic. Deliberately minimal and deterministic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "que", "por"))

  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Language-ID heuristic: argmax over languages of stopword hits;
    * 'und' (undetermined) when no list scores > 0. */
  def langId(text: Column): Column = {
    val w = words(lower(text))
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(array_intersect(w, array(sw.map(lit): _*))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality score in [0,1]: blend of length, word-length sanity,
    * alpha ratio and stopword presence — the usual cheap pre-filter
    * before expensive pipeline stages. */
  def qualityScore(text: Column): Column = {
    val w = words(text)
    val nWords = size(w).cast("double")
    val nChars = length(text).cast("double")
    val meanWordLen = nChars / greatest(nWords, lit(1.0))
    val alphaRatio = (length(regexp_replace(text, "[^a-zA-Z ]", "")).cast("double")) /
      greatest(nChars, lit(1.0))
    val sw = array(stopwords("en").map(lit): _*)
    val stopRatio = size(array_intersect(words(lower(text)), sw)).cast("double") /
      greatest(nWords, lit(1.0))
    val lenScore = least(nWords / 64.0, lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(least(greatest(
      lenScore * 0.3 + wordLenScore * 0.2 + alphaRatio * 0.3 + least(stopRatio * 5.0, lit(1.0)) * 0.2,
      lit(0.0)), lit(1.0)), 6)
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish token count: word pieces + punctuation via regex — a
    * deterministic proxy for tokenizer budgeting (≈ GPT-style
    * "words + punct + long-word splits"). */
  def tokenCountBpe(text: Column): Column = {
    // counting alnum runs directly ≡ size(filter(split(...), _ != ""))
    // without the interpreted HOF
    val pieces = regexp_count(text, lit("[A-Za-z0-9']+")).cast("long")
    val punct = length(regexp_replace(text, "[A-Za-z0-9'\\s]", "")).cast("long")
    // long words cost extra subword pieces: a word of length L adds
    // ceil((L-6)/6) = floor((L-1)/6) = the number of 6-char runs still
    // followed by a word char. One regex pass per row replaces the
    // per-word aggregate() lambda (higher-order functions run
    // interpreted and re-evaluate the split per element).
    val longExtra = regexp_count(text, lit("[^\\s]{6}(?=[^\\s])")).cast("long")
    pieces + punct + longExtra
  }

  /** Document fingerprint: 64-bit hash of the normalized text
    * (case-folded, whitespace-collapsed) — rolling-hash equivalent for
    * exact-dup detection after normalization. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Full document profile used by the pipeline query. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      langId(col(textCol)).as("lang_detected"),
      qualityScore(col(textCol)).as("quality"),
      tokenCountWs(col(textCol)).as("n_tokens_ws"),
      tokenCountBpe(col(textCol)).as("n_tokens_bpe"),
      fingerprint(col(textCol)).as("fp"))

  /** Split documents into overlapping token-window chunks — the
    * context-window prep step of an LLM training pipeline. Chunk i
    * covers whitespace tokens [i·stride, i·stride + chunkTokens),
    * stride = chunkTokens − overlapTokens; the last chunk may be
    * short; an empty document yields zero chunks.
    *
    * Scale: pure scan-side row expansion (explode over a computed
    * index range) — no shuffle, no state; expansion factor is
    * ~nTokens/stride, the same data inflation any chunker pays.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlapTokens < chunkTokens")
    val stride = chunkTokens - overlapTokens
    val toks = df.select(col(idCol), filter(words(col(textCol)), w => w =!= "").as("__t"))
      .withColumn("__n", size(col("__t")))
    // ceil((n - overlap) / stride) chunks; 0 for empty docs
    val nChunks = when(col("__n") <= lit(0), lit(0))
      .otherwise(ceil((col("__n") - lit(overlapTokens)).cast("double") / lit(stride)).cast("int"))
    toks.withColumn("__nc", greatest(nChunks, when(col("__n") > 0, lit(1))))
      .filter(col("__nc") > 0)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__t"), col("chunk_idx") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        size(slice(col("__t"), col("chunk_idx") * stride + 1, lit(chunkTokens)))
          .cast("long").as("n_tokens"))
  }

  /** Deterministic train/val/test split: assign each row a split
    * label from a stable hash of its id — reproducible across runs,
    * machines, and data order (the property random() sampling lacks),
    * and stable under corpus growth: an id keeps its split when new
    * data arrives. weights are relative (e.g. 98/1/1).
    *
    * Scale: one scan-side hash + threshold compare, no shuffle, no
    * state. Pass a custom `hashCol` (e.g. a modulo for oracle tests,
    * or a salted hash to decorrelate from another split). */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], hashCol: Option[Column] = None): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    val buckets = 1000000L
    val h = hashCol.getOrElse(pmod(xxhash64(col(idCol)), lit(buckets)))
    // cumulative thresholds over [0, buckets)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => (f * buckets).toLong)
    val label = splits.zipWithIndex.foldRight(lit(splits.last._1)) {
      case (((name, _), i), alt) => when(h < cuts(i + 1), lit(name)).otherwise(alt)
    }
    df.withColumn("split", label)
  }

  /** PII patterns, RE2-safe (no backreferences/lookaround) so the
    * DuckDB oracle can run the SAME pattern text verbatim. Order of
    * scrubbing: email first (contains dots/digits), then phone, then
    * IPv4 — the three patterns cannot match inside each other's
    * replacements. */
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val piiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redact common PII (emails, NANP-style phone numbers, IPv4
    * addresses) with typed placeholders — the standard scrub step
    * before corpus release. Scan-side chained regexp_replace: codegen,
    * no shuffle, no UDF. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmailRe, "[EMAIL]"),
        piiPhoneRe, "[PHONE]"),
      piiIpRe, "[IP]")

  /** Per-document bigram repetition metrics (the Gopher/C4 family of
    * duplicated-n-gram filters): total bigrams, the most frequent
    * bigram's count, and the duplicated-bigram fraction
    * (1 − distinct/total).
    *
    * Shape: explode bigrams → count per (doc, bigram) → per-doc
    * aggregate. Both aggregations combine map-side; the shuffle is
    * keyed by doc id — scan-bounded at 100 TB like the chunker.
    * Documents with < 2 words have no bigrams and are absent (callers
    * left-join and coalesce to zero). */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Ops.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        filter(words(lower(col(textCol))), w => w =!= "").as("__t"))
    val bi = toks.select(col(idCol),
      explode(filter(zip_with(col("__t"),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)), x => x.isNotNull)).as("__bg"))
    val perBg = bi.groupBy(col(idCol), col("__bg")).agg(count(lit(1)).as("__c"))
    perBg.groupBy(col(idCol)).agg(
      sum("__c").as("n_bigrams"),
      max("__c").as("max_bigram_n"),
      (lit(1.0) - count(lit(1)).cast("double") / sum("__c").cast("double"))
        .as("dup_bigram_frac"))
  }

  /** Gopher-style quality gate: per-document word count, mean word
    * length, stopword fraction and bigram repetition, combined into a
    * boolean `keep` under published-heuristic-shaped thresholds. The
    * scalar metrics are scan-side; repetition joins the (doc-keyed)
    * aggregate back — one shuffle total. */
  def gopherQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sw = array(stopwords("en").map(lit): _*)
    // interpreted-HOF tokenize/filter per row: spread a degenerate
    // single-split scan first (no-op when the scan has real splits)
    val base = Ops.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        filter(words(col(textCol)), x => x =!= "").as("__w"), col(textCol))
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("mean_word_len",
        length(regexp_replace(col(textCol), "\\s+", "")).cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"))
      .withColumn("stop_frac",
        size(filter(col("__w"), x => array_contains(sw, lower(x)))).cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"))
    base.join(repetitionMetrics(df, idCol, textCol), Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("mean_word_len"), col("stop_frac"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("max_bigram_n"), lit(0L)).as("max_bigram_n"),
        coalesce(col("dup_bigram_frac"), lit(0.0)).as("dup_bigram_frac"))
      .withColumn("keep",
        col("n_words") >= 5 && col("mean_word_len").between(2.0, 12.0) &&
          col("stop_frac") >= 0.01 && col("dup_bigram_frac") <= 0.6)
  }

  /** Boilerplate-line removal (the CCNet/C4 cleanup step): split each
    * document into lines, count per-line DOCUMENT frequency (distinct
    * docs containing the normalized line), drop lines present in more
    * than `maxDocFrac` of documents, reassemble preserving original
    * line order. Headers, nav bars and subscribe-footers repeat across
    * a crawl; real content doesn't.
    *
    * Shape: explode → one distinct-count aggregation keyed by line →
    * broadcast-anti-join the (tiny) boilerplate set back onto the
    * exploded lines → per-doc sort_array reassembly. The boilerplate
    * table is at most #distinct lines above the threshold — KB-scale
    * even on a 100 TB crawl. `totalDocs` runs one count job when not
    * supplied (same class of scalar as AQE's stats collection).
    *
    * @param sepRegex regex that splits documents into lines
    * @param sepOut   literal separator used to rejoin kept lines */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String, sepOut: String, maxDocFrac: Double = 0.05,
      totalDocs: Option[Long] = None): DataFrame = {
    require(maxDocFrac > 0 && maxDocFrac < 1, "maxDocFrac must be in (0, 1)")
    val nDocs = totalDocs.getOrElse(df.select(col(idCol)).count())
    val lines = Ops.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(split(col(textCol), sepRegex)).as(Seq("__pos", "__line")))
    val boiler = lines
      .groupBy(lower(trim(col("__line"))).as("__norm"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > lit(maxDocFrac * nDocs))
      .select(col("__norm"))
    val kept = lines.join(broadcast(boiler),
        lower(trim(col("__line"))) === col("__norm"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line")), sepOut).as("clean_text"))
    // a doc whose every line was boilerplate must survive as empty text
    df.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Deterministic stratified sampling for corpus mixing: each stratum
    * keeps rows whose stable id-hash falls under its rate — the
    * "2 epochs of wiki, 0.3 of crawl" mixing step, reproducible across
    * runs and stable under corpus growth (same properties as
    * [[assignSplit]]). Adds a boolean `sampled` column; scan-side, no
    * shuffle. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double,
      hashCol: Option[Column] = None): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val buckets = 1000000L
    val h = hashCol.getOrElse(pmod(xxhash64(col(idCol)), lit(buckets)))
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit((defaultRate * buckets).toLong)) {
      case (alt, (s, r)) =>
        when(col(strataCol) === s, lit((r * buckets).toLong)).otherwise(alt)
    }
    df.withColumn("sampled", h < thr)
  }

  /** Weighted sampling without replacement, `perStratum` docs per
    * stratum — Efraimidis & Spirakis ("Weighted random sampling with
    * a reservoir", IPL 2006): each row gets key u^(1/w) for a
    * uniform u, and the top keys ARE a weighted sample without
    * replacement. Distributed + deterministic: u derives from a hash
    * of the id (same sample on any cluster layout, any partitioning),
    * and the per-stratum cut is a rank window that plans as
    * WindowGroupLimit (per-partition top-k heaps, no stratum-wide
    * sort) — the reservoir semantics with no reservoir state.
    * Output: (stratum, id, w, key, rk), key rounded to 6 dp. */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, perStratum: Int,
      uCol: Option[Column] = None): DataFrame = {
    val buckets = 1000003L
    val u = uCol.getOrElse(
      (pmod(xxhash64(col(idCol)), lit(buckets)) + 0.5) / buckets)
    // key computed against the caller's frame (u may reference any of
    // its columns), THEN projected to the output shape
    val keyed = df
      .withColumn("__wsk",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 6))
      .select(col(strataCol).as("stratum"), col(idCol).as("id"),
        col(weightCol).cast("double").as("w"), col("__wsk").as("key"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("key").desc, col("id"))
    keyed.withColumn("rk", row_number().over(win).cast("long"))
      .filter(col("rk") <= perStratum)
  }

  /** Deterministic training-order shuffle key: md5 of `seed:id`. A
    * reproducible global shuffle of a 100 TB corpus is a distributed
    * RANGE-PARTITIONED SORT on this key (orderBy → TakeOrderedAndProject
    * for prefixes, range exchange + per-partition sort for full
    * rewrites) — never a global row_number window, whose single
    * partition would serialize the corpus through one task. Same seed →
    * same order on any cluster layout; changing the seed is a full
    * reshuffle, which is the point (per-epoch reshuffling). */
  def shuffleKey(idCol: Column, seed: String): Column =
    md5(concat(lit(seed), lit(":"), idCol.cast("string")))

  /** Temperature-based mixture weights over corpus strata (the
    * multilingual/multi-domain sampling rule of mT5/XLM-R: raw share
    * p_i is flattened to p_i^T / sum_j p_j^T, T in (0,1] — T=1 keeps
    * natural proportions, T→0 approaches uniform). Output is one row
    * per stratum with the raw share, the temperature share, and a
    * target document count for `budget`. The stratum table after the
    * groupBy is O(#domains) rows, so the scalar normalizer is a
    * broadcast cross-join of a 1-row aggregate — no window, no second
    * shuffle of data rows. */
  def temperatureMix(df: DataFrame, strataCol: String, temperature: Double,
      budget: Long): DataFrame = {
    require(temperature > 0 && temperature <= 1, "temperature must be in (0, 1]")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("__total"),
      sum(pow(col("n_docs"), temperature)).as("__pow_total"))
    counts.crossJoin(broadcast(total))
      .select(col(strataCol), col("n_docs"),
        round(col("n_docs") / col("__total"), 6).as("raw_share"),
        round(pow(col("n_docs"), temperature) / col("__pow_total"), 6)
          .as("temp_share"),
        // snap the share to 6 decimals BEFORE scaling by the budget:
        // pow() may differ by an ulp across engines, and floor() on an
        // unsnapped product would flip on that noise
        floor(round(pow(col("n_docs"), temperature) / col("__pow_total"), 6)
          * budget + lit(0.5)).cast("long").as("target_docs"))
  }

  /** Per-domain frequency cap (CCNet/RefinedWeb-style host capping):
    * keep at most `cap` documents per stratum, preferring higher
    * `prefer` then lower id — a deterministic tie-break so reruns keep
    * the same rows. Adds a boolean `kept` for accounting queries that
    * need both sides (kept + dropped counts). row_number over an
    * UnboundedPreceding frame carries O(1) running state per key — the
    * cost is the partition sort, not buffering — but every row still
    * flows through the window; when the dropped rows aren't needed,
    * use [[frequencyCapKeep]], whose rank FILTER (the shape Spark's
    * InferWindowGroupLimit rule matches, unlike a rank comparison
    * folded into a projection) compiles to WindowGroupLimit and stops
    * emitting per key at `cap` — asserted in PlanSpec. */
  def frequencyCap(df: DataFrame, strataCol: String, idCol: String,
      prefer: Column, cap: Int): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(prefer.desc, col(idCol))
    df.withColumn("kept", row_number().over(w) <= cap)
  }

  /** Capped rows only — the production form of [[frequencyCap]] for
    * the 100 TB path: filter-on-rank → WindowGroupLimit prunes each
    * domain to `cap` rows inside the window exec. */
  def frequencyCapKeep(df: DataFrame, strataCol: String, idCol: String,
      prefer: Column, cap: Int): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(prefer.desc, col(idCol))
    df.withColumn("__fc_rn", row_number().over(w))
      .filter(col("__fc_rn") <= cap).drop("__fc_rn")
  }

  /** Distinct normalized word n-grams of a text column: lowercase,
    * collapse every non-alphanumeric run to one space, split, slide an
    * n-window, space-rejoin. Empty/short docs yield an empty array (NOT
    * a reversed `sequence(1,0)` — Spark generates descending sequences
    * when stop < start, so the window index is gated on size >= n). */
  def wordGrams(text: Column, n: Int): Column =
    gramsOfWords(normWords(text), n)

  /** Normalized word array: lowercase, non-alphanumeric runs → space. */
  def normWords(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")

  /** n-gram windows over an ALREADY-MATERIALIZED word-array column.
    * Callers on a hot path must project the word array to an attribute
    * first and pass that attribute: the window lambda references `words`
    * once per index, and an interpreted higher-order `transform`
    * re-evaluates a closed-over expression subtree (e.g. the
    * split/regexp normalization inside [[wordGrams]]) PER ELEMENT —
    * observed ~6x on the decontamination probe at sf0.1. */
  def gramsOfWords(words: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Benchmark decontamination — the training-corpus hygiene step that
    * removes documents overlapping an evaluation set (GPT-3 §C / PaLM /
    * Llama report n-gram collision scrubbing; reference full-text
    * surface: `be/src/storage_primitive/inverted_index_iterator.h`
    * serves the analogous membership probe). A corpus document is
    * contaminated when >= `flagFrac` of its distinct word `n`-grams
    * also appear in any eval document.
    *
    * Scale shape: eval sets are benchmark-sized (KB..MB — thousands of
    * docs) while the corpus is the 100 TB side, so the distinct eval
    * grams are BROADCAST and the corpus side never shuffles: explode →
    * broadcast-hash semi-probe → per-doc count. The two aggregations
    * (total grams, hit grams) group on the corpus doc id — one shuffle
    * each of (id, count)-sized rows, partial-aggregated map-side.
    *
    * Returns only docs with >= 1 colliding gram: (id, hit_grams,
    * total_grams, contamination, flagged). Filter `flagged` to drop,
    * or join back to quarantine. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8, flagFrac: Double = 0.1): DataFrame = {
    // word arrays are projected to attributes BEFORE the gram windows:
    // see gramsOfWords — an interpreted transform() re-evaluates a
    // closed-over normalization subtree per window index
    val evalGrams = evalSet
      .select(normWords(col(textCol)).as("__w"))
      .select(explode(gramsOfWords(col("__w"), n)).as("__g")).distinct()
      .withColumn("__hit", lit(1))
    // grams are array_distinct per doc, so count(*) == distinct count;
    // a broadcast LEFT probe + conditional count gets hit AND total in
    // ONE pass over the corpus grams (one scan, one explode, one
    // doc-keyed shuffle — not a branch per aggregate)
    val grams = Ops.fanOut(corpus.select(col(idCol), col(textCol)))
      .select(col(idCol), normWords(col(textCol)).as("__w"))
      .select(col(idCol), explode(gramsOfWords(col("__w"), n)).as("__g"))
    grams.join(broadcast(evalGrams), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__hit")).as("hit_grams"), count(lit(1)).as("total_grams"))
      .filter(col("hit_grams") > 0)
      .select(col(idCol), col("hit_grams"), col("total_grams"),
        round(col("hit_grams").cast("double") / col("total_grams"), 6)
          .as("contamination"),
        (col("hit_grams").cast("double") / col("total_grams") >= flagFrac)
          .as("flagged"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — public method):
    * score each corpus document by how much its unigram distribution
    * resembles a target domain versus the raw corpus,
    *   score(d) = mean over tokens w of ln( p_target(w) / p_raw(w) )
    * with add-`smoothing` estimates. High scores = target-like docs;
    * sample/threshold on the weight to tilt a 100 TB crawl toward the
    * target mix.
    *
    * Scale shape: token counts are two word-keyed aggregations (map-side
    * partial combine, one shuffle each of vocabulary-sized output); the
    * two scalar totals join in as broadcast single-row frames; the
    * log-ratio table joins corpus tokens BY WORD (shuffle of
    * vocabulary-bounded rows, never doc x vocab); the per-doc mean is
    * one more doc-keyed aggregation. No driver-side state.
    *
    * Returns (idCol, n_tokens, score) — score unrounded; callers round
    * before cross-engine comparison (the token-order of the double sum
    * is engine-specific at the 1e-15 digit). */
  def importanceWeights(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, smoothing: Double = 1.0): DataFrame = {
    def toks(df: DataFrame, cols: Column*): DataFrame = df.select(cols :+
      explode(split(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")),
        " ")).as("__w"): _*)
    val tokens = toks(corpus, col(idCol))
    // both count tables are vocabulary-bounded and each feeds two
    // consumers (its total + the log-ratio join): LAZY-pin them so
    // the corpus/target tokenize-aggregate materializes once on
    // first use with no extra upfront job (eager pinning measured
    // +0.7 s on this floor-bound gate; at scale the second full
    // corpus scan is the cost that matters)
    val rcnt = tokens.groupBy(col("__w")).agg(count(lit(1)).cast("double").as("__rc"))
      .localCheckpoint(false)
    val tcnt = toks(target).groupBy(col("__w")).agg(count(lit(1)).cast("double").as("__tc"))
      .localCheckpoint(false)
    val rn = rcnt.agg(sum(col("__rc")).as("__rn"))
    val tn = tcnt.agg(sum(col("__tc")).as("__tn"))
    val s = lit(smoothing)
    // association mirrors the documented formula exactly — (t/tn)/(r/rn)
    // — so an engine-independent oracle can reproduce the doubles
    val lr = rcnt.join(tcnt, Seq("__w"), "left")
      .crossJoin(broadcast(rn)).crossJoin(broadcast(tn))
      .select(col("__w"),
        log(((coalesce(col("__tc"), lit(0.0)) + s) / (col("__tn") + s))
          / ((col("__rc") + s) / (col("__rn") + s))).as("__lr"))
    tokens.join(lr, Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("__lr")) / count(lit(1))).as("score"))
  }

  /** Capacity-quantized sequence packing: assign ordered chunks to
    * training sequences of ~maxTokens by bucketing the running token
    * total — seq_id = ⌊exclusive-cumsum / maxTokens⌋ over a
    * deterministic order WITHIN each partition (shard). This is the
    * SQL-parallel stand-in for greedy first-fit packing (inherently
    * sequential): bins can overshoot by at most one chunk and average
    * ≥ maxTokens − chunk size of fill.
    *
    * Scale: the window partitions by `partitionCols` (shard key —
    * lang, source, date...), so each cumsum is an independent sorted
    * partition; a GLOBAL cumsum (empty partitionCols) would funnel
    * every row through one task and is only for small inputs. The
    * training-sequence key is (partitionCols..., seq_id).
    */
  def packSequences(chunks: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[String], tokenCol: String, maxTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = if (partitionCols.nonEmpty)
      Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols.map(col): _*)
    else Window.orderBy(orderCols.map(col): _*)
    val w = base.rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("__before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("__before") / lit(maxTokens)))
      .drop("__before")
  }

  // ---------------- BPE training / encoding ----------------

  /** End-of-word marker symbol (Sennrich et al. 2016 convention). */
  private val BpeEow = "</w>"

  /** A word as a space-joined, space-padded symbol string:
    * "cat" → " c a t </w> ". Merges rewrite this string in place. */
  private def symString(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "), lit(BpeEow + " "))

  /** Train `merges` BPE merge rules over the corpus (Sennrich et al.
    * 2016, arXiv:1508.07909) — the full merge loop on top of the
    * pair-counting step ([[wordGrams]]-style counting gates as
    * corpus_bpe_pairs).
    *
    * Scale shape: BPE trains on the WORD-FREQUENCY table, not the
    * corpus — one corpus-scale explode+groupBy builds (word, freq)
    * (shuffle bounded by vocabulary size), and every merge round then
    * runs on that vocabulary-bounded cached table: count adjacent
    * symbol pairs weighted by word freq, take the global top pair
    * (one (pair, count) row to the driver per round — the only
    * driver traffic), rewrite the symbol strings with one
    * regexp_replace. A 100 TB corpus and a 1 GB corpus train at the
    * same per-round cost once the word table exists. Left-to-right
    * non-overlapping rewrite (zero-width lookahead keeps the
    * following separator matchable) reproduces reference BPE's greedy
    * single-pass merge; ties break on the lexicographically smallest
    * pair, so the learned rules are deterministic.
    *
    * Returns the merge table: (rank, left, right, merged, freq). */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int,
      minFreq: Long = 2L): Seq[(Int, String, String, String, Long)] = {
    var vocab = docs.select(explode(normWords(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(symString(col("w")).as("sym"), col("freq"))
    vocab = Pins.loopPin(vocab)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < merges && !exhausted) {
      // project the symbol array to an attribute before the pair
      // lambda (see gramsOfWords: interpreted HOFs re-evaluate
      // closed-over subtrees per element)
      val top = vocab
        .select(col("freq"), split(trim(col("sym")), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => concat(element_at(col("syms"), i), lit(" "),
            element_at(col("syms"), i + 1)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair").asc).limit(1)
        .collect()
      if (top.isEmpty || top.head.getLong(1) < minFreq) exhausted = true
      else {
        val Array(l, r) = top.head.getString(0).split(" ", 2)
        val freq = top.head.getLong(1)
        val merged = l + r
        val pattern = " " + java.util.regex.Pattern.quote(l + " " + r) + "(?= )"
        val replacement =
          java.util.regex.Matcher.quoteReplacement(" " + merged)
        vocab = vocab.withColumn("sym",
          regexp_replace(col("sym"), lit(pattern), lit(replacement)))
        // truncate lineage every few rounds (each eager checkpoint is
        // a job; a handful of stacked regexp_replaces re-run fine)
        if ((rank + 1) % 4 == 0) vocab = Pins.loopPin(vocab)
        learned += ((rank, l, r, merged, freq))
        rank += 1
      }
    }
    learned.toSeq
  }

  /** Encode a word column with learned merges: char-split + the merge
    * rewrites applied in rank order — a chain of `merges`
    * regexp_replace calls, all scan-side (no shuffle, no UDF).
    * Returns the symbol array (EOW marker kept on the last symbol). */
  def bpeSegmentWord(word: Column, merges: Seq[(String, String)]): Column = {
    val rewritten = merges.foldLeft(symString(word)) { case (acc, (l, r)) =>
      regexp_replace(acc,
        lit(" " + java.util.regex.Pattern.quote(l + " " + r) + "(?= )"),
        lit(java.util.regex.Matcher.quoteReplacement(" " + l + r)))
    }
    split(trim(rewritten), " ")
  }

  /** Within-document repeated-line removal (the intra-doc half of the
    * C4 cleanup; [[stripBoilerplate]] is the cross-doc half): split
    * each document into lines, keep only the FIRST occurrence of every
    * line, reassemble in original order, and report per-doc duplicate
    * stats (total lines, distinct lines, duplicated fraction).
    *
    * Shape: posexplode → (doc, line) aggregate keeping min position →
    * per-doc sort_array reassembly — both aggregations map-side
    * combine and the shuffle is keyed by doc id, so task state is one
    * document's distinct lines, scan-bounded at any corpus size. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n", sepOut: String = "\n"): DataFrame = {
    val lines = Ops.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(split(col(textCol), sepRegex)).as(Seq("__pos", "__line")))
    val firsts = lines.groupBy(col(idCol), col("__line"))
      .agg(min(col("__pos")).as("__first"), count(lit(1)).as("__n"))
    firsts.groupBy(col(idCol)).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("__first"), col("__line")))),
        s => s.getField("__line")), sepOut).as("clean_text"),
      sum("__n").as("n_lines"),
      count(lit(1)).as("n_uniq_lines"),
      (lit(1.0) - count(lit(1)).cast("double") / sum("__n").cast("double"))
        .as("dup_line_frac"))
  }
}
