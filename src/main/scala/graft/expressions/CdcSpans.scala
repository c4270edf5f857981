package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): split a document into spans whose
  * boundaries are decided by the CONTENT under a rolling hash, not by a
  * fixed character grid — the LBFS/rsync technique (Muthitacharoen et al.,
  * "A Low-Bandwidth Network File System", SOSP'01 §3.1) that makes
  * sub-document dedup alignment-robust: a duplicated region re-synchronizes
  * to the same boundaries no matter what offset it sits at in each
  * document, so [[graft.operators.Dedup.cdcSpanDedup]] catches the
  * off-grid duplicates the fixed grid of `spanDedup` (its own documented
  * stride caveat) provably misses.
  *
  * Boundary rule, chosen to be reproducible in portable ANSI SQL (the
  * DuckDB oracle recomputes it with a per-char explode): after the code
  * point at 1-based position `i >= window`, cut iff
  * `polyhash(cp[i-window+1..i]) % divisor == 0`, where `polyhash` is the
  * stepwise-mod polynomial `h := (h * base + cp) % modulus` folded over the
  * window's code points (stepwise so 64-bit arithmetic never overflows on
  * either engine). Expected span length ~= `divisor` code points. A cut at
  * the last position produces no empty trailing span.
  *
  * Emits `(span_idx, n_spans, span)` rows; the spans concatenate back to
  * the exact input text. NULL or empty text emits no rows (the document
  * drops, matching the grid variant). One O(len) pass per row, a handful of
  * integer ops per code point — no per-char explode on the Spark side.
  *
  * No max-span bound: a degenerate document the hash never cuts (e.g. one
  * repeated character) yields a single doc-sized span. Bounding it would
  * need sequential boundary suppression (min/max chunk sizes), which breaks
  * the pure per-position cut predicate the SQL mirror depends on; the
  * downstream cost of a doc-sized span is the same per-doc reassembly the
  * grid variant already pays.
  */
case class CdcSpans(child: Expression, window: Int, base: Int, modulus: Int,
    divisor: Int) extends UnaryExpression with Generator with CodegenFallback {
  require(window > 0 && base > 1 && modulus > 1 && divisor > 1,
    s"bad cdc params (window=$window, base=$base, modulus=$modulus, divisor=$divisor)")
  require(modulus.toLong * base + 0x10FFFF < Long.MaxValue,
    s"modulus*base must fit a long with headroom (got $modulus * $base)")

  override def elementSchema: StructType = StructType(Seq(
    StructField("span_idx", IntegerType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false),
    StructField("span", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return Iterator.empty
    // ring buffer of the last `window` code points; the boundary hash is
    // recomputed per position (window is small, ~8) with the same stepwise
    // mod the SQL mirror nests, so both engines compute bit-identical cuts
    val ring = new Array[Int](window)
    val spans = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var seen = 0 // code points consumed
    var j = 0    // UTF-16 index into s
    while (j < s.length) {
      val cp = s.codePointAt(j)
      j += Character.charCount(cp)
      sb.appendCodePoint(cp)
      ring(seen % window) = cp
      seen += 1
      if (seen >= window && j < s.length) { // never cut after the last cp
        var h = 0L
        var k = seen - window
        while (k < seen) { h = (h * base + ring(k % window)) % modulus; k += 1 }
        if (h % divisor == 0) { spans += sb.toString; sb.setLength(0) }
      }
    }
    if (sb.length > 0) spans += sb.toString
    val n = spans.length
    spans.iterator.zipWithIndex.map { case (sp, i) =>
      InternalRow(i, n, UTF8String.fromString(sp))
    }
  }

  override protected def withNewChildInternal(c: Expression): CdcSpans = copy(child = c)
}
