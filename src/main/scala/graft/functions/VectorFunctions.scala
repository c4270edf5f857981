package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` embedding columns, built
  * from `zip_with`/`aggregate` higher-order functions (codegen'd, no UDF).
  * Accumulation is in double for numeric stability and engine-independent
  * determinism (left-to-right fold over the array = fixed order).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Deterministic pseudo-random hyperplanes for sign-LSH (SimHash for
    * vectors, Charikar 2002): component j of plane i comes from a seeded
    * xorshift generator, so every run (and every executor) agrees.
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var state = seed ^ 0x5DEECE66DL
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
    */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = typedlit(p.toSeq)
      when(dot(v, planeCol) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
