package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (the UDTF surface): explode a document into
  * overlapping character chunks as `(chunk_idx, chunk_text)` rows.
  *
  * Windowing arithmetic is IDENTICAL to the t12 chunking query's
  * posexplode+substring composition — chunks start at 0, stride, 2*stride,
  * ...; count = ceil(max(len - chunk, 0) / stride) + 1; the slice is SQL
  * `substring(text, i*stride + 1, chunk)` via the same
  * `UTF8String.substringSQL` the built-in Substring expression uses (code
  * points, 1-based) — so the two formulations are row-for-row equal and
  * share one DuckDB oracle. NULL text yields ONE `(0, NULL)` row — exactly
  * what the composition produces (`greatest(NULL - chunk, 0)` is 0 on both
  * engines, giving one index whose substring slice is NULL); outer-explode
  * semantics that keep the document visible downstream.
  *
  * Registered through GraftExtensions as `chunk_spans(text, chunk, stride)`
  * — usable from SQL in a select list or `LATERAL VIEW`, the Scala-side
  * analog of a user-defined table function.
  */
case class ChunkSpans(child: Expression, chunk: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(chunk > 0 && stride > 0, s"chunk/stride must be positive, got ($chunk, $stride)")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.single(InternalRow(0, null))
    else {
      val s = v.asInstanceOf[UTF8String]
      val over = math.max(s.numChars() - chunk, 0)
      val n = (over + stride - 1) / stride + 1
      // one UTF8String slice per chunk, no full-string materialization —
      // the per-row work is O(len), same as the substring composition
      (0 until n).iterator
        .map(i => InternalRow(i, s.substringSQL(i * stride + 1, chunk)))
    }
  }

  override protected def withNewChildInternal(c: Expression): ChunkSpans = copy(child = c)
}
