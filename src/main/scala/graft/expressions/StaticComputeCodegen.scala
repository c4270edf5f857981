package graft.expressions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** Codegen for the struct-producing one-pass text walks (TextStatsExpr,
  * CharDistributionExpr, RepetitionStatsExpr): emit ONE static call into
  * the helper object's mirror class — scalac generates a static forwarder
  * for `compute` on every standalone object — so the expression stays a
  * direct call inside the generated stage with no CodegenFallback
  * input-row boxing, no per-plan reference slot, and no requirement that
  * the helper serialize to executors. Subexpression elimination can then
  * share the struct when several output columns consume it.
  *
  * The helper's `compute(String)` must be TOTAL for non-null input (never
  * returns null): `nullSafeCodeGen` re-establishes only the child's null
  * check, exactly like `UnaryExpression.eval` -> `nullSafeEval` does on
  * the interpreted path.
  */
trait StaticComputeCodegen { self: UnaryExpression =>
  /** Fully-qualified mirror class of the helper object, e.g.
    * "graft.expressions.TextStats".
    */
  protected def helperClass: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helperClass.compute($c.toString());")
}
