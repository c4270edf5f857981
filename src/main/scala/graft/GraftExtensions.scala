package graft

import graft.expressions.{MinHashSig, ShingleHashes, SimHash}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-facing registration of the graft signature expressions, so
  * `spark.sql("SELECT minhash_sig(text, 3, 64) ...")` works.
  *
  * Two doors:
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *   - `GraftExtensions.register(spark)` on an existing session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private[graft] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args.head, intArg(args(1), "n"))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args.head, intArg(args(1), "n"), intArg(args(2), "k"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash(args.head)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
