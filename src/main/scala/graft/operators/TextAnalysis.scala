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
}
