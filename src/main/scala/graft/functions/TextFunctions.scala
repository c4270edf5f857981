package graft.functions

import graft.expressions.{MinHashSig, ShingleHashes, ShingleStrings, SimHash, TextStatsExpr}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions` higher-order
  * functions — fully codegen'd, no UDFs, no driver-side work — so each scales
  * as a narrow per-row map over arbitrarily many executors. ANSI-safe: hash
  * mixing uses xor/shift/or only (no overflowing multiplies).
  */
object TextFunctions {

  /** Whitespace tokens, empty-safe. HOF formulation — kept for the
    * array-HOF showcase query; hot paths should prefer [[tokensFast]].
    * The explicit class is RE2's `\s` ([[graft.expressions.Hash64.isWs]]):
    * Java regex `\s` additionally matches `\x0B`, which would tokenize
    * differently from the DuckDB `'\s+'` oracles.
    */
  def tokens(c: Column): Column =
    filter(split(trim(c), "[ \\t\\n\\f\\r]+"), t => length(t) > lit(0))

  /** Whitespace tokens via the tight-loop shingle expression (n=1 word
    * shingles ARE the tokens). The `filter(split(...))` HOF chain is
    * CodegenFallback with per-element lambda boxing — the measured ~100x
    * trap — while this is one JVM loop per row.
    */
  def tokensFast(c: Column): Column = shingles(c, 1)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Unicode NFC canonicalization (see [[graft.expressions.NfcNormalize]]):
    * run before fingerprinting/dedup so decomposed and precomposed accent
    * forms hash identically. Mirrors DuckDB's `nfc_normalize`.
    */
  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(graft.expressions.NfcNormalize(ExpressionUtils.expression(c)))

  /** BPE-ish subword count: runs of letters, runs of digits, and each
    * remaining non-space symbol count as one token (a cheap proxy for a
    * byte-pair-encoded length, useful for token-budget accounting).
    */
  def bpeTokenCount(c: Column): Column =
    // explicit RE2-\s class, same contract as [[tokens]]
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]")).cast("int")

  /** Characters that are ASCII punctuation, as a ratio of all characters. */
  def punctRatio(c: Column): Column = {
    val punct = length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))
    when(length(c) === 0, lit(0.0)).otherwise(punct.cast("double") / length(c))
  }

  private val EnglishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "this",
    "for", "on", "with", "as", "are", "was", "be", "at", "by", "not", "but")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => lower(t).isin(EnglishStopwords: _*))).cast("double") / size(toks))

  def meanWordLen(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Composite quality score in [0,1]: rewards mid-length documents with a
    * healthy stopword ratio and word lengths, penalizes punctuation soup.
    * Heuristic in the C4/Gopher-rules tradition (length + symbol ratios).
    */
  def qualityScore(text: Column): Column = qualityScoreFromTokens(text, tokens(text))

  /** [[qualityScore]] with the token array precomputed (materialize it once
    * per row when combining several token-based metrics — the tokenizer is
    * the expensive part).
    */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val n = size(toks).cast("double")
    val lengthScore = least(n / lit(50.0), lit(1.0)) // saturate at 50 tokens
    val wordLenOk = {
      val m = meanWordLen(toks)
      when(m >= 3 && m <= 10, 1.0).when(m > 0, 0.5).otherwise(0.0)
    }
    val punctOk = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopOk = least(stopwordRatio(toks) * lit(5.0), lit(1.0))
    round((lengthScore * 0.3 + wordLenOk * 0.3 + punctOk * 0.2 + stopOk * 0.2), 4)
  }

  private val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "des", "est", "que"))

  /** N-gram/stopword language-ID heuristic: CJK codepoint ratio decides zh;
    * otherwise the language whose stopword list hits the most tokens wins;
    * tie/none -> "und" (undetermined). Pure column expressions — no UDF.
    */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(lower(text)))

  def langIdFromTokens(text: Column, lowerToks: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    val total = greatest(length(text), lit(1))
    val toks = lowerToks
    val scored = StopwordsByLang.map { case (lang, sw) =>
      (lang, size(filter(toks, t => t.isin(sw: _*))))
    }
    val best = scored.tail.foldLeft[(Column, Column)]((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(cjk.cast("double") / total > 0.05, "zh")
      .when(best._2 > 0, best._1)
      .otherwise("und")
  }

  /** Count of tokens in the given stopword list (case-insensitive). A high
    * stopword ratio is a standard natural-language-ness signal for corpus
    * quality filtering.
    */
  def stopwordCount(c: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(c), t => lower(t).isin(stopwords: _*)))

  /** Content fingerprint: 64-bit xxhash of whitespace-normalized text.
    * O(len) per row, codegen'd; the constant-seed Spark `xxhash64`.
    */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(text)))

  /** Word-level rolling (polynomial-ish, xor/rotate) hash — order-sensitive,
    * unlike [[fingerprint]]'s flat hash; ANSI-safe (no multiply overflow).
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => shiftleft(acc, 5).bitwiseXOR(shiftright(acc, 59)).bitwiseXOR(xxhash64(t)))

  /** Word n-gram shingles as strings, e.g. n=3: ["a b c", "b c d", ...].
    * Documents shorter than n tokens yield an empty array.
    * Tight-loop expression ([[graft.expressions.ShingleStrings]]).
    */
  def shingles(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleStrings(ExpressionUtils.expression(text), n))

  /** 64-bit hashes of the distinct shingles, sorted ascending (tight-loop
    * custom expression — see [[graft.expressions.ShingleHashes]] for why
    * not HOFs).
    */
  def shingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(text), n))

  /** Exact Jaccard of two sorted distinct long arrays (the [[shingleHashes]]
    * output contract) — one linear merge per pair.
    */
  def jaccardSorted(a: Column, b: Column): Column =
    ExpressionUtils.column(graft.expressions.JaccardSorted(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** MinHash signature of length k over word-n-gram shingles
    * ([[graft.expressions.MinHashSig]]).
    */
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(text), n, k))

  /** 64-bit SimHash over distinct tokens: per-bit vote of each token hash,
    * sign -> bit ([[graft.expressions.SimHash]]).
    */
  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(text)))

  /** Engine-portable MinHash signature (md5-derived permutations a DuckDB
    * oracle can recompute bit-for-bit —
    * [[graft.expressions.MinHashSigMd5]]). Slightly slower than
    * [[minhashSignature]] (md5 vs splitmix64 per shingle); use it where
    * cross-engine verifiability matters.
    */
  def minhashSignatureMd5(text: Column, n: Int, k: Int): Column =
    ExpressionUtils.column(graft.expressions.MinHashSigMd5(
      ExpressionUtils.expression(text), n, k))

  /** Engine-portable 60-bit SimHash ([[graft.expressions.SimHashMd5]]). */
  def simhash60(text: Column): Column =
    ExpressionUtils.column(graft.expressions.SimHashMd5(
      ExpressionUtils.expression(text)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** One-pass within-document repetition statistics
    * ([[graft.expressions.RepetitionStatsExpr]]): duplicate-line and
    * repeated-n-gram integer counters for the Gopher repetition filters.
    */
  def repetitionStats(c: Column): Column =
    ExpressionUtils.column(graft.expressions.RepetitionStatsExpr(
      ExpressionUtils.expression(c)))

  /** Fixture-weight n-gram language identification
    * ([[graft.expressions.LangIdExpr]]): (lang, score, margin) struct,
    * all-integer scores a DuckDB oracle recomputes exactly — the
    * engine-exact, one-pass successor of the HOF [[langId]] heuristic.
    */
  def langIdScore(c: Column): Column =
    ExpressionUtils.column(graft.expressions.LangIdExpr(
      ExpressionUtils.expression(c)))

  /** Greedy longest-prefix SUBWORD token count over the fixture vocabulary
    * ([[graft.expressions.TokenCountExpr]]) — the packing budget unit.
    * [[tokenCount]] counts whitespace words and [[bpeTokenCount]] counts
    * regex run classes; this is actual vocab-driven tokenizer inference,
    * what a trainer's tokenizer produces.
    */
  def vocabTokenCount(c: Column): Column =
    ExpressionUtils.column(graft.expressions.TokenCountExpr(
      ExpressionUtils.expression(c)))

  /** One-pass fixture n-gram LM scoring ([[graft.expressions.NgramLmExpr]]):
    * (n_tokens, total_cost) integer struct — the CCNet perplexity-filter
    * shape with fixed-point costs a DuckDB oracle replays exactly.
    */
  def ngramLmStats(c: Column): Column =
    ExpressionUtils.column(graft.expressions.NgramLmExpr(
      ExpressionUtils.expression(c)))

  /** One-pass code-point distribution summary
    * ([[graft.expressions.CharDistributionExpr]]): struct(n_cp, n_distinct,
    * sum_sq) — exact integers for Gini-impurity curation scoring.
    */
  def charDistribution(c: Column): Column =
    ExpressionUtils.column(graft.expressions.CharDistributionExpr(
      ExpressionUtils.expression(c)))

  /** Content-defined chunking generator ([[graft.expressions.CdcSpans]]):
    * explodes a text column into (span_idx, n_spans, span) rows whose
    * boundaries re-synchronize on content — use in a select list like
    * posexplode.
    */
  def cdcSpans(text: Column, window: Int, base: Int, modulus: Int,
      divisor: Int): Column =
    ExpressionUtils.column(graft.expressions.CdcSpans(
      ExpressionUtils.expression(text), window, base, modulus, divisor))

  /** One-pass text statistics struct ([[graft.expressions.TextStatsExpr]]):
    * n_chars, n_tokens, token_len_sum, punct, cjk, bpe, per-language
    * stopword hits — a single walk replacing N stacked tokenizing lambdas.
    */
  def textStats(c: Column): Column =
    ExpressionUtils.column(TextStatsExpr(ExpressionUtils.expression(c)))

  /** [[qualityScore]] computed from a [[textStats]] struct (same formula,
    * one text pass instead of ~8).
    */
  def qualityScoreFromStats(stats: Column): Column = {
    val n = stats.getField("n_tokens").cast("double")
    val lengthScore = least(n / lit(50.0), lit(1.0))
    val m = when(n === 0, 0.0).otherwise(stats.getField("token_len_sum").cast("double") / n)
    val wordLenOk = when(m >= 3 && m <= 10, 1.0).when(m > 0, 0.5).otherwise(0.0)
    val chars = stats.getField("n_chars").cast("double")
    val punctRatio = when(chars === 0, 0.0).otherwise(stats.getField("punct") / chars)
    val punctOk = lit(1.0) - least(punctRatio * 5.0, lit(1.0))
    val stopRatio = when(n === 0, 0.0).otherwise(stats.getField("stop_en") / n)
    val stopOk = least(stopRatio * lit(5.0), lit(1.0))
    round((lengthScore * 0.3 + wordLenOk * 0.3 + punctOk * 0.2 + stopOk * 0.2), 4)
  }

  /** [[langId]] computed from a [[textStats]] struct. */
  def langIdFromStats(stats: Column): Column = {
    val total = greatest(stats.getField("n_chars"), lit(1)).cast("double")
    val scored = Seq("en" -> stats.getField("lang_en"), "es" -> stats.getField("stop_es"),
      "de" -> stats.getField("stop_de"), "fr" -> stats.getField("stop_fr"))
    val best = scored.tail.foldLeft[(Column, Column)]((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(stats.getField("cjk") / total > 0.05, "zh")
      .when(best._2 > 0, best._1)
      .otherwise("und")
  }
}
