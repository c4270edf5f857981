package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. In Spark 4 the public `Column` is
  * backed by a ColumnNode and the converters live in `private[sql]`
  * `org.apache.spark.sql.classic.ExpressionUtils`; this shim (in the sql
  * namespace, the usual pattern for Spark extension libraries) re-exports
  * just the two conversions the graft custom expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Blocking metric fetch: the listener bus delivers Observation metrics
    * asynchronously, so a non-blocking read right after the write races and
    * can come back empty. The write has already finished when this is
    * called, so `get` resolves promptly.
    */
  def observed(o: org.apache.spark.sql.Observation): Map[String, Any] = o.get
}
