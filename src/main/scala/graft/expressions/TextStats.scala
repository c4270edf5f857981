package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics for quality scoring / language ID.
  *
  * The same metrics as the HOF formulation (tokenize + N filter/aggregate
  * lambdas = N interpreted passes per row) in a single character walk:
  * token count, total token length, ASCII-punctuation count, CJK codepoint
  * count, per-language stopword hits, BPE-ish subword count, char count.
  */
object TextStats {
  val EnStop: Set[String] = Set("the", "a", "an", "and", "or", "of", "to", "in", "is",
    "it", "that", "this", "for", "on", "with", "as", "are", "was", "be", "at", "by",
    "not", "but")
  /** Narrower list used for language ID votes (mirrors TextFunctions.StopwordsByLang). */
  val EnLang: Set[String] = Set("the", "and", "of", "to", "in", "is", "that", "it", "for", "with")
  val EsStop: Set[String] = Set("el", "la", "de", "que", "y", "en", "un", "los", "del", "por")
  val DeStop: Set[String] = Set("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu")
  val FrStop: Set[String] = Set("le", "la", "les", "de", "et", "un", "une", "des", "est", "que")
  /** Gopher (Rae et al. 2021) App. A1.1 stopword list — DISTINCT hits are
    * one of the paper's quality rules (>= 2 of these must appear). */
  val GopherStop: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("token_len_sum", LongType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("cjk", IntegerType, nullable = false),
    StructField("bpe", IntegerType, nullable = false),
    StructField("stop_en", IntegerType, nullable = false),
    StructField("lang_en", IntegerType, nullable = false),
    StructField("stop_es", IntegerType, nullable = false),
    StructField("stop_de", IntegerType, nullable = false),
    StructField("stop_fr", IntegerType, nullable = false),
    // Gopher-rule inputs (appended fields — earlier positions are pinned
    // by t02's SQL mirror): tokens containing an ASCII letter, and the
    // DISTINCT-hit count over GopherStop
    StructField("alpha_tokens", IntegerType, nullable = false),
    StructField("gopher_stops", IntegerType, nullable = false)))

  def compute(text: String): InternalRow = {
    var nTokens = 0
    var tokenLenSum = 0L
    var punct = 0
    var cjk = 0
    var bpe = 0
    var stopEn = 0; var langEn = 0; var stopEs = 0; var stopDe = 0; var stopFr = 0
    var alphaTokens = 0
    var gopherMask = 0 // bit i = GopherStop(i) seen (distinct-hit count)
    val sb = new java.lang.StringBuilder(16)
    var inLetters = false; var inDigits = false
    var i = 0
    val n = text.length
    var nChars = 0
    var tokCp = 0 // current token length in CODEPOINTS (see below)
    var tokHasAlpha = false
    def endToken(): Unit = if (sb.length > 0) {
      nTokens += 1
      tokenLenSum += tokCp
      if (tokHasAlpha) alphaTokens += 1
      val w = sb.toString.toLowerCase
      if (EnStop.contains(w)) stopEn += 1
      if (EnLang.contains(w)) langEn += 1
      if (EsStop.contains(w)) stopEs += 1
      if (DeStop.contains(w)) stopDe += 1
      if (FrStop.contains(w)) stopFr += 1
      var g = 0
      while (g < GopherStop.length) {
        if (GopherStop(g) == w) gopherMask |= 1 << g
        g += 1
      }
      sb.setLength(0); tokCp = 0; tokHasAlpha = false
    }
    // walk by CODEPOINT, not UTF-16 unit: DuckDB's length()/regex counts
    // codepoints, so a per-unit walk counts every astral char (emoji,
    // supplementary CJK) twice in n_chars/token_len_sum and counts its two
    // surrogates as two bpe "symbols" — a confirmed oracle divergence on
    // emoji-bearing documents
    while (i < n) {
      val c = text.codePointAt(i)
      nChars += 1
      // RE2-\s contract shared with every oracle-checked tokenizer (all
      // RE2-\s chars are BMP, so the Char overload is safe here)
      val isWs = c <= 0xFFFF && Hash64.isWs(c.toChar)
      if (isWs) { endToken(); inLetters = false; inDigits = false }
      else {
        sb.appendCodePoint(c)
        tokCp += 1
        val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        val isDigit = c >= '0' && c <= '9'
        // BPE-ish: a letter run, a digit run, or a lone symbol each count once
        if (isLetter) { tokHasAlpha = true; if (!inLetters) bpe += 1; inLetters = true; inDigits = false }
        else if (isDigit) { if (!inDigits) bpe += 1; inDigits = true; inLetters = false }
        else { bpe += 1; inLetters = false; inDigits = false }
        if (c >= '!' && c <= '~' && !isLetter && !isDigit) punct += 1
        if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      }
      i += Character.charCount(c)
    }
    endToken()
    new GenericInternalRow(Array[Any](nChars, nTokens, tokenLenSum, punct, cjk, bpe,
      stopEn, langEn, stopEs, stopDe, stopFr,
      alphaTokens, Integer.bitCount(gopherMask)))
  }
}

case class TextStatsExpr(child: Expression)
    extends UnaryExpression with StaticComputeCodegen {
  override def dataType: DataType = TextStats.schema
  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String].toString)
  // NOT CodegenFallback (see StaticComputeCodegen): the walk is a direct
  // static call inside the generated stage of every full-corpus curation
  // scan this sits in (t01/t02/t20/t23/d08)
  override protected def helperClass: String = "graft.expressions.TextStats"
  override protected def withNewChildInternal(c: Expression): TextStatsExpr = copy(child = c)
  override def prettyName: String = "text_stats"
}

/** Unicode NFC normalization (java.text.Normalizer) — the standard text
  * canonicalization step before fingerprinting/dedup: decomposed accent
  * sequences (e + U+0301) and precomposed forms (é) hash identically
  * after it. Mirrors DuckDB's `nfc_normalize` (both implement Unicode
  * Normalization Form C), which is what makes the t14 query oracle-able.
  * Fast path: Normalizer.isNormalized is a cheap scan and most real text
  * is already NFC — skip the allocation when it is.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
