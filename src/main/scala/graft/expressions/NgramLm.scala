package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass n-gram language-model scoring (t29) — the CCNet curation step
  * (Wenzek et al. 2020: filter web text by the perplexity of a small LM
  * trained on clean text), reduced to the engine-exact discipline of the
  * other profile expressions: a FIXTURE bigram/unigram table with
  * fixed-point integer costs (milli-nats), stupid-backoff-shaped lookup
  * (Brants et al. 2007 — bigram hit, else unigram + a flat backoff
  * penalty, else the OOV cost), integer accumulation, and ONE final
  * division in the query. No libm, no floats inside the walk — a DuckDB
  * oracle replays every lookup via a token/lag join over the same literal
  * tables, so the whole scorer hash-checks.
  *
  * Tokenization is the [[TokenCount]] convention: split on single spaces,
  * empty segments contribute nothing; the bigram context is the previous
  * NONEMPTY token, `"<s>"` at the document start (mirrored by the SQL
  * `COALESCE(lag(w) OVER ..., '<s>')`).
  *
  * Scale shape: per-row, shuffle-free, O(len) with O(1) hash lookups per
  * token — a 100 TB perplexity filter stays inside one whole-stage-codegen
  * projection via the static-call trait.
  */
object NgramLm {

  /** Flat backoff penalty added to a unigram cost when the bigram missed. */
  val Backoff = 100L

  /** Cost of a token outside the fixture vocabulary. */
  val Oov = 1200L

  /** Fixture unigram costs (milli-nats) over the synthetic corpus's
    * vocabulary; a couple of corpus words (customer, vector) are
    * deliberately absent so the OOV branch fires on real fixture text.
    * The DuckDB oracle embeds the SAME pairs as a VALUES list — see
    * [[uniSqlValues]] (generated from this array, single definition).
    */
  val Unigrams: Array[(String, Long)] = Array(
    ("the", 200L), ("a", 220L), ("data", 400L), ("table", 380L),
    ("value", 420L), ("row", 450L), ("key", 460L), ("part", 480L),
    ("scan", 500L), ("fast", 520L), ("slow", 540L), ("hash", 560L),
    ("join", 580L), ("agg", 600L), ("window", 620L), ("line", 470L),
    ("sort", 530L), ("group", 510L), ("order", 490L), ("small", 550L),
    ("big", 430L), ("batch", 640L), ("query", 660L), ("filter", 680L),
    ("merge", 650L), ("spark", 630L), ("column", 690L), ("stream", 710L))

  /** Fixture bigram costs (milli-nats): high-frequency corpus pairs, all
    * cheaper than their backoff path so a bigram hit is observable.
    */
  val Bigrams: Array[(String, String, Long)] = Array(
    ("the", "table", 150L), ("a", "row", 180L), ("data", "table", 250L),
    ("fast", "scan", 220L), ("key", "value", 160L), ("table", "scan", 200L),
    ("big", "data", 170L), ("the", "line", 190L))

  /** SQL `(w, c)` VALUES rows for the oracle — generated from [[Unigrams]]
    * so the two engines cannot drift.
    */
  def uniSqlValues: String =
    Unigrams.map { case (w, c) => s"('$w', $c)" }.mkString(", ")

  /** SQL `(p, w, c)` VALUES rows for the oracle. */
  def biSqlValues: String =
    Bigrams.map { case (p, w, c) => s"('$p', '$w', $c)" }.mkString(", ")

  // boxed values: java.util.HashMap.get must return null (not unbox) on a
  // missing key — the miss IS the backoff/OOV signal
  private val uniMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    Unigrams.foreach { case (w, c) => m.put(w, java.lang.Long.valueOf(c)) }
    m
  }
  private val biMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    Bigrams.foreach { case (p, w, c) => m.put(p + " " + w, java.lang.Long.valueOf(c)) }
    m
  }

  def compute(text: String): GenericInternalRow = {
    var n = 0L
    var tot = 0L
    var prev = "<s>"
    var wordStart = 0
    val len = text.length
    while (wordStart <= len) {
      var wordEnd = text.indexOf(' ', wordStart)
      if (wordEnd < 0) wordEnd = len
      if (wordEnd > wordStart) {
        val tok = text.substring(wordStart, wordEnd)
        val bi = biMap.get(prev + " " + tok)
        val cost =
          if (bi != null) bi.longValue()
          else {
            val uni = uniMap.get(tok)
            if (uni != null) uni.longValue() + Backoff else Oov
          }
        tot += cost
        n += 1L
        prev = tok
      }
      wordStart = wordEnd + 1
    }
    new GenericInternalRow(Array[Any](n, tot))
  }
}

case class NgramLmExpr(child: Expression)
    extends UnaryExpression with StaticComputeCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("total_cost", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    NgramLm.compute(input.asInstanceOf[UTF8String].toString)

  override protected def helperClass: String = "graft.expressions.NgramLm"

  override protected def withNewChildInternal(c: Expression): NgramLmExpr =
    copy(child = c)
}
