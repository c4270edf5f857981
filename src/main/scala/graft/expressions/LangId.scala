package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass n-gram language identification (t26) — the standard public
  * fastText-langid shape (character/word n-gram features -> linear scores
  * -> argmax; Joulin et al. 2016) reduced to an engine-exact fixture-weight
  * classifier: a small table of language-marker n-grams, each counted as
  * NON-OVERLAPPING left-to-right occurrences (exactly what SQL
  * `(length(t) - length(replace(t, f, ''))) / length(f)` computes, so a
  * DuckDB oracle reproduces every score bit-for-bit), summed into one
  * integer score per language.
  *
  * Output is all-integer plus the argmax label: (lang, score, margin) where
  * `lang` is the alphabetically-first language attaining the max score
  * ("und" when every score is 0 — no marker seen), `score` is that max, and
  * `margin` is max minus the best OTHER language's score (0 on a tie) — the
  * confidence gate a curation pipeline thresholds on. No libm, no floats,
  * no UDF: the t23 discipline.
  *
  * Scale shape: per-row, shuffle-free, and the occurrence counting is
  * indexOf loops over the feature table (F=21 features x one scan each,
  * features are 3-7 chars) — a full-corpus language split stays inside one
  * whole-stage-codegen'd projection.
  */
object LangId {
  /** Alphabetical — ties resolve to the smaller index, so the order IS the
    * tie-break contract the oracle mirrors.
    */
  val Langs: Array[String] = Array("de", "en", "es", "fr", "zh")

  /** (marker n-gram, lang index). Word markers carry surrounding spaces —
    * the classic bag-of-words-with-boundaries fastText trick — so "table"
    * never fires fr's " le ". All weights are 1 (the count IS the score);
    * discriminative power comes from marker choice, which is what keeps
    * the SQL mirror one replace() per feature.
    */
  val Features: Array[(String, Int)] = Array(
    (" der ", 0), (" und ", 0), (" das ", 0), (" nicht ", 0),
    (" the ", 1), (" a ", 1), (" of ", 1), (" and ", 1), (" is ", 1),
    (" el ", 2), (" los ", 2), (" que ", 2), (" y ", 2),
    (" le ", 3), (" les ", 3), (" est ", 3), (" une ", 3),
    ("的", 4), ("了", 4), ("是", 4), ("在", 4))

  private val Und = UTF8String.fromString("und")
  private val LangU8 = Langs.map(UTF8String.fromString)

  /** Non-overlapping left-to-right occurrence count — `String.indexOf`
    * advancing by the pattern length, the same greedy scan SQL `replace`
    * performs, so the two engines agree on every input including
    * adjacent/overlapping candidate matches ("aaa" contains "aa" once).
    */
  private def countOcc(text: String, pat: String): Int = {
    var n = 0
    var from = 0
    while ({ val i = text.indexOf(pat, from); i >= 0 && { from = i + pat.length; n += 1; true } }) ()
    n
  }

  def compute(text: String): GenericInternalRow = {
    val scores = new Array[Int](Langs.length)
    var f = 0
    while (f < Features.length) {
      val (pat, lang) = Features(f)
      scores(lang) += countOcc(text, pat)
      f += 1
    }
    var best = 0
    var i = 1
    while (i < scores.length) { if (scores(i) > scores(best)) best = i; i += 1 }
    var second = 0
    i = 0
    while (i < scores.length) {
      if (i != best && scores(i) > second) second = scores(i)
      i += 1
    }
    val label = if (scores(best) == 0) Und else LangU8(best)
    new GenericInternalRow(Array[Any](label, scores(best), scores(best) - second))
  }
}

case class LangIdExpr(child: Expression)
    extends UnaryExpression with StaticComputeCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score", IntegerType, nullable = false),
    StructField("margin", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[UTF8String].toString)

  override protected def helperClass: String = "graft.expressions.LangId"

  override protected def withNewChildInternal(c: Expression): LangIdExpr =
    copy(child = c)
}
