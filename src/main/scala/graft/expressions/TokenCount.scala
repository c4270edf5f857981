package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE-style subword token count (t27) — what a training pipeline actually
  * budgets sequence packing by (characters mis-size CJK and long compound
  * words). The tokenizer is the public greedy longest-prefix-match scheme
  * (WordPiece/BPE-vocab inference; Sennrich et al. 2016 applies merges,
  * whose end state IS a vocab — greedy longest-match against that vocab is
  * the standard deterministic inference): split on single spaces, then
  * consume each word left-to-right taking the LONGEST vocabulary prefix at
  * each position (one codepoint when nothing matches), one token per
  * consumed piece.
  *
  * Everything is integer and the vocabulary is a fixture constant, so a
  * DuckDB oracle replays the identical walk with a recursive CTE
  * (`max(length(v))` over prefix-matching vocab entries = the same greedy
  * choice; `substr` advances by CHARACTERS, which is why the no-match step
  * consumes one CODEPOINT here, not one UTF-16 char). Empty segments from
  * repeated spaces contribute nothing.
  *
  * Scale shape: per-row, shuffle-free, O(len x longest-vocab-entry) over
  * [[TokenCount.Vocab]] (whose length, not a hardcoded count, is the
  * contract the oracle's literal list must mirror entry for entry) — stays
  * inside whole-stage codegen via the static-call trait like the other
  * profile expressions.
  */
object TokenCount {
  /** Fixture vocabulary: the synthetic corpus's high-frequency words plus a
    * few generic subword units, longest-first not required (compute scans
    * for the max-length match). Lowercase ASCII only; matching is
    * case-sensitive exactly like the SQL mirror's `substr(...) = v`.
    */
  val Vocab: Array[String] = Array(
    "customer", "column", "stream", "filter", "window", "vector",
    "batch", "spark", "merge", "query", "small", "value", "order",
    "group", "table", "scan", "hash", "line", "part", "slow", "sort",
    "fast", "data", "join", "big", "key", "agg", "row", "the",
    "er", "ing", "an", "st", "on")

  def compute(text: String): Long = {
    var tokens = 0L
    var wordStart = 0
    val len = text.length
    while (wordStart <= len) {
      var wordEnd = text.indexOf(' ', wordStart)
      if (wordEnd < 0) wordEnd = len
      var pos = wordStart
      while (pos < wordEnd) {
        // longest vocab prefix at pos (within the word), else one codepoint
        var bestLen = 0
        var v = 0
        while (v < Vocab.length) {
          val cand = Vocab(v)
          if (cand.length > bestLen && pos + cand.length <= wordEnd &&
              text.startsWith(cand, pos)) bestLen = cand.length
          v += 1
        }
        pos += (if (bestLen > 0) bestLen
                else Character.charCount(text.codePointAt(pos)))
        tokens += 1L
      }
      wordStart = wordEnd + 1
    }
    tokens
  }
}

case class TokenCountExpr(child: Expression)
    extends UnaryExpression with StaticComputeCodegen {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TokenCount.compute(input.asInstanceOf[UTF8String].toString)

  // the static-call trait is type-agnostic (ev.value is declared from
  // dataType), so it serves this primitive-long helper exactly as it
  // serves the struct-producing ones
  override protected def helperClass: String = "graft.expressions.TokenCount"

  override protected def withNewChildInternal(c: Expression): TokenCountExpr =
    copy(child = c)
}
