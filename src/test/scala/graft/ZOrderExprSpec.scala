package graft

/** Property pins for the round-10 expressions: QuantileBucket's binary
  * search must agree exactly with the reference fold it replaced
  * (count of strictly-increasing boundaries <= v), and the Morton
  * spread-LUT interleave must be a bijection on (bucketA, bucketB).
  */
class ZOrderExprSpec extends SparkSpec {

  private def referenceBucket(v: Double, bounds: Array[Double]): Long =
    if (v.isNaN) 0L else bounds.count(b => v >= b).toLong

  test("QuantileBucket == reference when()-fold semantics on seeded random inputs") {
    val rnd = new scala.util.Random(42)
    val specials = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0)
    (1 to 200).foreach { _ =>
      val bounds = Array.fill(1 + rnd.nextInt(30))(rnd.nextDouble() * 200 - 100)
        .distinct.sorted
      val expr = graft.expressions.QuantileBucket(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, org.apache.spark.sql.types.DoubleType, nullable = true), bounds)
      val vs = Seq.fill(30)(rnd.nextDouble() * 400 - 200) ++ specials ++
        bounds.take(3).toSeq // exact boundary hits
      vs.foreach { v =>
        val row = org.apache.spark.sql.catalyst.InternalRow(v)
        assert(expr.eval(row) == referenceBucket(v, bounds),
          s"v=$v bounds=${bounds.take(5).mkString(",")}...")
      }
      // null lands in bucket 0 (the fold's CaseWhen contract)
      assert(expr.eval(org.apache.spark.sql.catalyst.InternalRow(null)) == 0L)
    }
  }

  test("QuantileBucket: ±0.0 follow SQL >= semantics (equal), not Double.compare order") {
    val expr = graft.expressions.QuantileBucket(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = true), Array(-1.0, 0.0, 1.0))
    def bucket(v: Double): Long =
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(v)).asInstanceOf[Long]
    // the fold's `v >= 0.0` was true for -0.0 (SQL equality); so must this be
    assert(bucket(-0.0) == 2L && bucket(0.0) == 2L)
    // unsorted / duplicated boundaries are refused at construction
    intercept[IllegalArgumentException](graft.expressions.QuantileBucket(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = true), Array(5.0, 1.0)))
    intercept[IllegalArgumentException](graft.expressions.QuantileBucket(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = true), Array(1.0, 1.0)))
  }

  test("QuantileBucket: exact boundary hits count the boundary (v == b[i] -> i+1)") {
    val bounds = Array(1.0, 2.0, 5.0, 9.0)
    val expr = graft.expressions.QuantileBucket(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = true), bounds)
    def bucket(v: Double): Long =
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(v)).asInstanceOf[Long]
    assert(bucket(0.5) == 0L && bucket(1.0) == 1L && bucket(1.5) == 1L)
    assert(bucket(2.0) == 2L && bucket(5.0) == 3L && bucket(9.0) == 4L && bucket(100.0) == 4L)
  }

  test("spread-LUT Morton interleave is a bijection over the 2-D bucket grid") {
    // mirror ZOrder.zvalue's spread function for 2 dims x 8 bits
    def spread(v: Int, d: Int, nDims: Int): Long = {
      var out = 0L; var i = 0
      while (i < 8) { if (((v >> i) & 1) == 1) out |= 1L << (i * nDims + d); i += 1 }
      out
    }
    val seen = new java.util.HashSet[java.lang.Long](70000)
    var a = 0
    while (a < 256) {
      var b = 0
      while (b < 256) {
        val z = spread(a, 0, 2) + spread(b, 1, 2)
        assert(seen.add(z), s"collision at ($a,$b) -> $z")
        b += 1
      }
      a += 1
    }
    assert(seen.size == 65536)
    // locality sanity: adjacent cells differ in few z-bits near the origin
    assert((spread(0, 0, 2) + spread(0, 1, 2)) == 0L)
    assert((spread(1, 0, 2) + spread(0, 1, 2)) == 1L)
    assert((spread(0, 0, 2) + spread(1, 1, 2)) == 2L)
    assert((spread(1, 0, 2) + spread(1, 1, 2)) == 3L)
  }
}
