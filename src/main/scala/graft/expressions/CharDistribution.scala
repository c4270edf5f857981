package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass code-point distribution summary for curation scoring: total
  * code points, distinct code points, and the sum of squared per-codepoint
  * counts. `1 - sum_sq/n^2` is the Gini impurity of the character
  * distribution — near 0 for degenerate/repetitive text (one character
  * dominating: padding runs, progress-bar spam), high for natural prose,
  * near the uniform maximum for random/encoded payloads masquerading as
  * text. All three fields are INTEGERS, so any engine that can explode
  * characters reproduces them exactly — the downstream Gini is one exact
  * division, no order-dependent float accumulation (the reason this isn't
  * a Shannon-entropy expression: a sum of p*ln(p) terms depends on
  * summation order and libm).
  *
  * NULL text evaluates to null; empty text to (0, 0, 0). One O(len) walk,
  * state bounded by the alphabet (a HashMap of distinct code points).
  */
object CharDistribution {
  def compute(text: String): InternalRow = {
    val counts = new java.util.HashMap[Integer, Integer]()
    var n = 0
    var j = 0
    while (j < text.length) {
      val cp = text.codePointAt(j)
      j += Character.charCount(cp)
      counts.merge(cp, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      n += 1
    }
    var sumSq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next().toLong; sumSq += c * c }
    new GenericInternalRow(Array[Any](n, counts.size(), sumSq))
  }
}

case class CharDistributionExpr(child: Expression)
    extends UnaryExpression with StaticComputeCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    CharDistribution.compute(input.asInstanceOf[UTF8String].toString)

  override protected def helperClass: String = "graft.expressions.CharDistribution"

  override protected def withNewChildInternal(c: Expression): CharDistributionExpr =
    copy(child = c)
}
