package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis functions for large-scale corpus curation, built only
 * from codegen'd `org.apache.spark.sql.functions` (no UDFs — every
 * helper here stays inside whole-stage codegen, which is what keeps a
 * 100 TB text scan CPU-bound instead of serialization-bound).
 *
 * Capabilities: tokenization, token counting, n-gram extraction,
 * language-ID by stopword profiles, quality scoring
 * (length/punctuation/stopword ratios), and document fingerprinting
 * (md5 canonical hash + shingle rolling hashes).
 */
object TextFunctions {

  /** Lower-cased whitespace tokens; empty string → empty array (plain
    * `split("")` would yield `[""]`, which poisons token counts). */
  def tokens(text: Column): Column = {
    val t = split(trim(lower(text)), "\\s+")
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType))).otherwise(t)
  }

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /**
   * Sliding windows of `n` consecutive tokens as an array of structs
   * with fields t0..t(n-1): `arrays_zip` of n shifted slices.
   *
   * This shape matters for performance: each slice is one O(T) pass and
   * the downstream `transform` lambda reads only its own element. The
   * tempting alternative — `transform(sequence(...), i =>
   * f(element_at(toks, i)))` — re-evaluates the outer `toks` expression
   * on EVERY lambda iteration in interpreted HOF eval (no common
   * subexpression elimination), which turns tokenization into
   * O(tokens²) per document.
   */
  def tokenWindows(toks: Column, n: Int): Column = {
    val len = size(toks) - (n - 1)
    arrays_zip((0 until n).map(o => slice(toks, lit(o + 1), len).as(s"t$o")): _*)
  }

  /** Word n-grams as space-joined strings. */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(tokenWindows(toks, n),
        w => concat_ws(" ", (0 until n).map(o => w.getField(s"t$o")): _*)))

  /** Distinct shingles (deduped n-grams) — the MinHash input set. */
  def shingles(text: Column, n: Int): Column = array_distinct(ngrams(tokens(text), n))

  // ---- language ID -----------------------------------------------------

  /** Tiny stopword profiles (top function words) for a heuristic n-gram/
    * stopword language classifier. Profiles are public linguistic data. */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"))

  /** Count of tokens that appear in `words` (with multiplicity). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast(LongType)

  /** Best-scoring language label, "und" when nothing matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(toks, words).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // ---- quality scoring -------------------------------------------------

  /** Ratio of non-alphanumeric, non-space chars to total chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text).cast(DoubleType)
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast(DoubleType)
    when(total === 0, 0.0).otherwise(punct / total)
  }

  /** Ratio of tokens that are English stopwords — high for natural prose,
    * near zero for tables/boilerplate/code. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(stopwordHits(toks, stopwordProfiles("en")).cast(DoubleType) /
        size(toks).cast(DoubleType))
  }

  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) /
        size(toks).cast(DoubleType))
  }

  /** Composite [0,1] quality score: rewards prose-like stopword density,
    * penalizes punctuation noise, extreme lengths, and very short docs.
    * Weights are heuristic; the value is deterministic and monotone in
    * its inputs so it is stable for oracle comparison when rounded. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val lengthScore = least(nTok / 20.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 4.0, lit(1.0))
    round(greatest(lit(0.0),
      lengthScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2), 6)
  }

  // ---- fingerprinting --------------------------------------------------

  /** Canonical content fingerprint: md5 of whitespace-normalized,
    * lower-cased text — engine-portable (md5 is identical everywhere). */
  def contentFingerprint(text: Column): Column =
    md5(array_join(tokens(text), " ").cast(BinaryType))

  /** Shingle fingerprint: min over the document's shingles of a 60-bit
    * md5-derived hash (first 15 hex chars read as an integer) — a
    * 1-perm MinHash near-dup prefilter whose value is reproducible in
    * any engine with md5 (DuckDB/Trino/Athena), so fingerprints written
    * by this engine can be joined against ones computed elsewhere. For
    * the pure-Spark hot path, [[graft.operators.Dedup.hashedShingles]]'s
    * native expression is the faster choice. */
  def shingleFingerprint(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    when(size(sh) === 0, lit(null).cast(LongType))
      .otherwise(array_min(transform(sh, s =>
        conv(substring(md5(s), 1, 15), 16, 10).cast(LongType))))
  }
}
