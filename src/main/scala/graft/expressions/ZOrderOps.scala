package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Equal-population bucket id for z-order clustering: the count of
  * precomputed (strictly increasing) quantile boundaries <= v, via one
  * binary search per row — O(log B) against the B-term `when()` fold it
  * replaces, whose ~255 chained CaseWhens per dimension blew generated
  * code past JIT limits and evaluated interpreted at ~16k rows/s
  * (37 s per pass over sf0.1 lineitem; this expression does the same
  * pass in well under a second).
  *
  * Contract: nulls and NaNs land in bucket 0; v == boundary[i] counts it
  * (i+1 buckets are <= v). Nulls match the fold it replaced (CaseWhen
  * null-comparison semantics). NaN is a DELIBERATE divergence: the fold's
  * `when(v >= lit(b), 1)` used Spark SQL comparison semantics where NaN is
  * greater than every value, so NaN rows landed in the TOP bucket; here
  * they join nulls in bucket 0, which keeps every non-orderable value in
  * one place. Impact is layout-only (which file a NaN row lands in), never
  * query results — parquet min/max stats exclude NaN either way, so
  * skipping is unaffected. ZOrderExprSpec pins THIS contract (its
  * referenceBucket uses Scala comparison semantics, i.e. NaN -> 0).
  */
case class QuantileBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with CodegenFallback {
  // binarySearch is undefined on unsorted input, and duplicated boundaries
  // shift the <=-count — ZOrder sorts/dedups before constructing, but the
  // SQL-registered `quantile_bucket` accepts arbitrary literal arrays, so
  // the contract is enforced HERE, loudly, for every entry path
  require(boundaries.zip(boundaries.drop(1)).forall { case (a, b) => a < b },
    "quantile_bucket boundaries must be strictly increasing: " +
      boundaries.take(8).mkString(", ") + (if (boundaries.length > 8) ", ..." else ""))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket expects DOUBLE, got ${child.dataType.simpleString}")

  // eval (not nullSafeEval): a null input must yield bucket 0, not null —
  // the when()-fold's CaseWhen semantics this expression replaces
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else {
      val d0 = v.asInstanceOf[Double]
      if (d0.isNaN) 0L
      else {
        // ±0.0 normalize: SQL's >= treats them equal (the fold's contract)
        // but Double.compare — and so binarySearch — orders -0.0 < 0.0
        val d = if (d0 == 0.0) 0.0 else d0
        val idx = java.util.Arrays.binarySearch(boundaries, d)
        // exact hit at i: i+1 boundaries are <= v; miss: the insertion
        // point IS the count of boundaries < v (none equal)
        (if (idx >= 0) idx + 1 else -idx - 1).toLong
      }
    }
  }
  override protected def withNewChildInternal(c: Expression): QuantileBucket =
    copy(child = c)
  override def prettyName: String = "quantile_bucket"
}
