package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * token counting, quality scoring, fingerprinting, n-gram shingling,
  * language ID. All are pure `Column` expressions built from Spark's
  * codegen'd built-ins — no UDFs, so they stay inside whole-stage codegen
  * and scale linearly with no shuffle (each is a narrow, per-row map).
  *
  * These extend the reference's capability surface (the reference has no
  * text operators — SURVEY.md §2.8 "no math/regex/array/map scalar
  * functions"); they are the training-data-pipeline layer of this engine.
  */
object TextFunctions {

  /** Whitespace-normalized, lower-cased text — the canonical form used by
    * fingerprints and shingles. */
  def normalizeWs(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Tokens on single spaces of the normalized text. */
  def tokens(text: Column): Column = split(normalizeWs(text), " ")

  /** Token count (whitespace tokenization), as BIGINT. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** A BPE-ish sub-word proxy: count of maximal runs of letters, digits, or
    * single punctuation — closer to a real tokenizer's token count than
    * whitespace splitting. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => length(t) > 0)).cast("long")

  /** REAL byte-pair-encoding apply (GPT-2 `bpe()` greedy merge loop) over
    * a ranked merge table: per whitespace word, start from code points and
    * repeatedly merge every left-to-right occurrence of the lowest-rank
    * adjacent pair (merged tokens chain into later merges). Returns the
    * document's token array; the merge table — trained offline, e.g. by
    * [[bpeTrainMerges]] — rides the codegen'd kernel as one broadcast-like
    * reference object, so scoring is a narrow map with no shuffle and no
    * UDF. `merges` order IS the rank order. */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    NativeHash.bpeEncode(text, merges)

  /** BPE token COUNT under a merge table, as BIGINT. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeTokens(text, merges)).cast("long")

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("long")

  /** Exact-match token occurrences of a literal word (cheap stopword probe;
    * portable to a SQL oracle via list_filter over the same tokenization). */
  def wordOccurrences(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === lit(word))).cast("long")

  /** Document fingerprint: md5 of the whitespace-normalized text. Identical
    * formatting/casing variants collide — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalizeWs(text))

  /** 64-bit rolling-style content fingerprint (xxhash64 of normalized text)
    * — cheaper than md5 when a 64-bit key suffices at 100 TB scale. */
  def fingerprint64(text: Column): Column = xxhash64(normalizeWs(text))

  /** Word n-gram shingles of the normalized text, as an array of strings.
    * Documents shorter than n tokens yield their whole text as one shingle.
    *
    * PERFORMANCE TRAP: this form inlines the tokenization TREE inside the
    * `transform` lambda, and higher-order-function lambdas re-evaluate
    * their referenced subtrees PER ELEMENT — split+regex runs once per
    * shingle (measured 8.5× slower at sf0.1). Fine for one-off column use;
    * hot paths must tokenize behind a real column boundary and use
    * [[shinglesFromTokens]] (see [[shingleSets]]). */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles from an ALREADY-MATERIALIZED token array column (a bound
    * attribute, not an expression tree) — per-element re-evaluation of an
    * attribute reference is free. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) <= n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Distinct shingle set (the Jaccard universe). See the [[shingles]]
    * performance note. */
  def shingleSet(text: Column, n: Int = 3): Column = array_distinct(shingles(text, n))

  def shingleSetFromTokens(toks: Column, n: Int): Column =
    array_distinct(shinglesFromTokens(toks, n))

  /** (id, sh) relation of distinct shingle sets with tokenization placed
    * behind a column boundary — THE form for corpus-scale shingling.
    * CollapseProject keeps the boundary: the token alias is non-cheap and
    * multiply-referenced, so the optimizer won't inline it back into the
    * shingling lambda. */
  def shingleSets(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      n: Int = 3): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), shingleSetFromTokens(col("__toks"), n).as("sh"))

  /** PII-lite scrubbing for pretraining corpora: replace emails and URLs
    * with stable placeholder tokens. Patterns deliberately use only syntax
    * shared by Java regex and RE2 (no lookarounds/backrefs), so a SQL
    * oracle can mirror them verbatim. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^ \\t\\n]+"

  def scrubEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text, emailPattern, token)

  def scrubUrls(text: Column, token: String = "<URL>"): Column =
    regexp_replace(text, urlPattern, token)

  /** Both scrubbers composed — URL first so mailto-less addresses inside
    * URLs don't leave partial artifacts. */
  def scrubPii(text: Column): Column = scrubEmails(scrubUrls(text))

  /** Distinct-token ratio per mille — the cheap repetition detector
    * (boilerplate/spam has low distinct ratios). Tokens are never empty
    * (split of "" yields [""]), so no zero-division branch. */
  def distinctRatioX1000(text: Column): Column = {
    val toks = tokens(text)
    floor((size(array_distinct(toks)).cast("long") * lit(1000L)) /
      size(toks).cast("long")).cast("long")
  }

  /** Quality-scoring components (all deterministic integers/ratios):
    * token count, char count, punctuation ratio, mean token length,
    * stopword ratio — the standard cheap text-quality heuristics. */
  def qualityComponents(text: Column): Seq[(String, Column)] = {
    val nTok = tokenCount(text)
    val nChar = length(text).cast("long")
    val stop = Seq("the", "a", "and", "of", "to", "in", "is")
      .map(wordOccurrences(text, _)).reduce(_ + _)
    Seq(
      "n_tokens" -> nTok,
      "n_chars_m" -> nChar,
      "n_punct" -> punctCount(text),
      "n_stopwords" -> stop,
      // floor(double-div) == integer division for positives at these
      // magnitudes (numerators < 2^53, quotient ulp ≪ 1/denominator)
      "mean_token_len_x100" ->
        when(nTok > 0, floor((nChar * lit(100L)) / nTok)).otherwise(lit(0L)).cast("long"),
      "stopword_ratio_x1000" ->
        when(nTok > 0, floor((stop * lit(1000L)) / nTok)).otherwise(lit(0L)).cast("long"))
  }

  /** Coarse quality label from the components — the filter a pretraining
    * pipeline would apply before dedup. */
  def qualityLabel(text: Column): Column = {
    val nTok = tokenCount(text)
    val stopRatio = when(nTok > 0,
      (Seq("the", "a", "and", "of", "to", "in", "is")
        .map(wordOccurrences(text, _)).reduce(_ + _) * lit(1000L)) / nTok)
      .otherwise(lit(0L))
    when(nTok < 5, lit("too_short"))
      .when(stopRatio === 0, lit("no_stopwords"))
      .otherwise(lit("ok"))
  }

  /** Language-ID by stopword-profile scoring: the language whose stopword
    * set hits the most tokens wins. Pure array expressions (no UDF); add
    * profiles to cover more languages. Ties broken by profile order. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "que", "dans", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "por", "que", "en", "una"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langProfiles.map { case (lang, words) =>
      val wordsArr = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(wordsArr, t)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }
}
