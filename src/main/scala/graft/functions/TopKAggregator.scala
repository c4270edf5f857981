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

  private def insert(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] = {
    val merged = (buf :+ v).sortBy { case (score, id) => (-score, id) }
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
