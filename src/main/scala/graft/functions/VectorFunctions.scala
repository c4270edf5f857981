package graft.functions

import graft.expressions.{CosineSim, DotProduct, L2Distance, LshBucket}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}

/** Dense-vector math over `ArrayType(FloatType)` embedding columns, as
  * tight-loop Catalyst expressions ([[graft.expressions.VectorOps]]) — the
  * `zip_with`/`aggregate` HOF formulations are CodegenFallback with
  * per-element boxing, ~100x slower on 64-dim vectors. Accumulation is
  * double, strictly left-to-right (the HOF fold order), so results are
  * deterministic and engine-comparison-stable.
  */
object VectorFunctions {

  private def expr(c: Column) = ExpressionUtils.expression(c)

  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(expr(a), expr(b)))

  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(expr(a), expr(b)))

  def l2Distance(a: Column, b: Column): Column =
    ExpressionUtils.column(L2Distance(expr(a), expr(b)))

  /** Symmetric int8 scalar quantization (4x embedding storage reduction);
    * [[graft.expressions.QuantizeI8]].
    */
  def quantizeI8(v: Column): Column =
    ExpressionUtils.column(graft.expressions.QuantizeI8(expr(v)))

  /** Deterministic pseudo-random hyperplanes for sign-LSH (SimHash for
    * vectors, Charikar 2002): component j of plane i comes from a seeded
    * xorshift generator, so every run (and every executor) agrees.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    // xorshift's one fixed point is state 0 (every output would be -1.0 and
    // all planes identical — LSH degenerates to a cross join); re-seed it
    var state = seed ^ 0x5DEECE66DL
    if (state == 0L) state = 0x9E3779B97F4A7C15L
    def next(): Double = {
      // xorshift64*
      state ^= state >>> 12; state ^= state << 25; state ^= state >>> 27
      val v = state * 0x2545F4914F6CDD1DL
      (v >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(numPlanes, dim)(next())
  }

  /** Sign-LSH bucket id: bit i = sign(v . plane_i), packed into a long.
    * Vectors close in cosine land in the same bucket with high probability;
    * used to make near-dup search / ANN a bucket-local problem instead of a
    * full cross join — the difference between O(n^2) and O(n) at 100 TB.
    * One pass over the vector computes all plane dots.
    */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(LshBucket(expr(v), planes))

  /** `nprobe` nearest IVF cells of `v` (sorted by distance, then cell id)
    * as one plan node at any k; [[graft.expressions.NearestCells]].
    */
  def nearestCells(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ExpressionUtils.column(graft.expressions.NearestCells(expr(v), centroids, nprobe))
}
