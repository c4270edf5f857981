package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k highest-scoring (score, id) pairs
  * per group with a bounded buffer — map-side partial aggregation means the
  * shuffle carries at most k pairs per group per partition, unlike the
  * window/row_number formulation which shuffles EVERY candidate row. The
  * better shape when candidate lists are huge (e.g. ANN scoring at scale).
  *
  * Deterministic: ties broken by smaller id.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // buffer invariant: sorted by (-score, id). The hot path is reduce() on
  // millions of candidate rows per group: a full buffer rejects a
  // non-qualifying row in O(1) (compare against the current minimum) and
  // inserts a qualifying one in O(k), instead of re-sorting O(k log k) +
  // reallocating per row.
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.length >= k && !beats(v, buf.last)) return buf
    val at = buf.indexWhere(e => beats(v, e))
    val merged =
      if (at < 0) buf :+ v
      else (buf.take(at) :+ v) ++ buf.drop(at)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    insert(b, a)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (b1 ++ b2).sortBy { case (score, id) => (-score, id) }.take(k)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
