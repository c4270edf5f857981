package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass within-document repetition statistics — the Gopher repetition
  * filters' raw inputs (Rae et al. 2021, "Scaling Language Models", App.
  * A1.2: documents dominated by duplicate lines or repeated n-grams are
  * template/spam noise). All counters are exact integers under the repo's
  * EXCESS convention (t07/t13: repeated mass = total − distinct), so the
  * downstream fractions are single exact divisions any engine reproduces:
  *
  *   - n_lines / dup_line_excess: newline-split lines with ≥1 code point;
  *     excess = occurrences beyond each distinct line value's first
  *   - line_chars / dup_line_char_excess: the same in code points
  *   - n_chars: total code points of the text (the coverage denominator)
  *   - top2_cover: max over word 2-grams of count·len(gram) — the
  *     "fraction of characters in the most frequent 2-gram" numerator,
  *     max-coverage variant (no tie-break ambiguity: ties resolve by the
  *     larger coverage, which is the quantity of interest)
  *   - dup3_chars: Σ over word 3-grams occurring ≥2 times of
  *     count·len(gram) — the duplicate-3-gram character-mass numerator
  *
  * Words are the t04 token contract ([[PortableHash.tokenize]]); grams
  * join tokens with one space; lengths are code points. NULL text → null;
  * state is bounded by one document's distinct lines/grams. One O(len)
  * walk, no shuffle — the scale-right shape for a per-row curation signal.
  */
object RepetitionStats {
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  def compute(s: String): InternalRow = {
    // lines: split on '\n' exactly (no trimming — a line differing only in
    // padding is a different line), empties excluded from both counters
    val lineCounts = new java.util.HashMap[String, Integer]()
    var nLines = 0
    var lineChars = 0L
    s.split("\n", -1).foreach { ln =>
      if (ln.nonEmpty) {
        nLines += 1
        lineChars += cpLen(ln)
        lineCounts.merge(ln, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      }
    }
    var dupLineExcess = 0
    var dupLineCharExcess = 0L
    lineCounts.forEach { (ln, c) =>
      if (c > 1) { dupLineExcess += c - 1; dupLineCharExcess += (c - 1).toLong * cpLen(ln) }
    }
    // tokens: THE whitespace contract (Hash64.isWs == RE2's \s set; Java's
    // own \s adds \x0B and String.trim strips all <= U+0020, both of which
    // diverge from DuckDB on hostile whitespace) — the one shared walk, so
    // a contract change applies to every tokenized oracle at once
    val toks = PortableHash.tokenize(s)
    def gramStats(n: Int): (Int, java.util.HashMap[String, Integer]) = {
      val m = new java.util.HashMap[String, Integer]()
      var i = 0
      var total = 0
      while (i + n <= toks.length) {
        val g = toks.slice(i, i + n).mkString(" ")
        m.merge(g, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
        total += 1
        i += 1
      }
      (total, m)
    }
    val (n2, g2) = gramStats(2)
    var top2 = 0L
    g2.forEach { (g, c) =>
      val cover = c.toLong * cpLen(g)
      if (cover > top2) top2 = cover
    }
    val (n3, g3) = gramStats(3)
    var dup3 = 0L
    g3.forEach { (g, c) => if (c > 1) dup3 += c.toLong * cpLen(g) }
    new GenericInternalRow(Array[Any](
      cpLen(s), nLines, dupLineExcess, lineChars, dupLineCharExcess,
      n2, top2, n3, dup3))
  }
}

case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with StaticComputeCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_excess", IntegerType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_char_excess", LongType, nullable = false),
    StructField("n_2grams", IntegerType, nullable = false),
    StructField("top2_cover", LongType, nullable = false),
    StructField("n_3grams", IntegerType, nullable = false),
    StructField("dup3_chars", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String].toString)

  override protected def helperClass: String = "graft.expressions.RepetitionStats"

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}
