package graft

import graft.expressions.{CosineSim, DotProduct, JaccardSorted, L2Distance,
  MinHashSig, ShingleHashes, ShingleStrings, SimHash, TextStatsExpr}
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
      (args: Seq[Expression]) => SimHash(args.head)),
    ("shingle_strings",
      new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
      (args: Seq[Expression]) => ShingleStrings(args.head, intArg(args(1), "n"))),
    ("jaccard_sorted",
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (args: Seq[Expression]) => JaccardSorted(args.head, args(1))),
    ("text_stats",
      new ExpressionInfo(classOf[TextStatsExpr].getName, "text_stats"),
      (args: Seq[Expression]) => TextStatsExpr(args.head)),
    ("vec_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    ("vec_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "vec_cosine"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))),
    ("vec_l2",
      new ExpressionInfo(classOf[L2Distance].getName, "vec_l2"),
      (args: Seq[Expression]) => L2Distance(args.head, args(1))),
    ("quantize_i8",
      new ExpressionInfo(classOf[graft.expressions.QuantizeI8].getName, "quantize_i8"),
      (args: Seq[Expression]) => graft.expressions.QuantizeI8(args.head)),
    ("minhash_sig_md5",
      new ExpressionInfo(classOf[graft.expressions.MinHashSigMd5].getName, "minhash_sig_md5"),
      (args: Seq[Expression]) =>
        graft.expressions.MinHashSigMd5(args.head, intArg(args(1), "n"), intArg(args(2), "k"))),
    ("simhash60",
      new ExpressionInfo(classOf[graft.expressions.SimHashMd5].getName, "simhash60"),
      (args: Seq[Expression]) => graft.expressions.SimHashMd5(args.head)),
    ("nfc_normalize",
      new ExpressionInfo(classOf[graft.expressions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => graft.expressions.NfcNormalize(args.head)),
    // table-generating function (UDTF surface): select list / LATERAL VIEW
    ("chunk_spans",
      new ExpressionInfo(classOf[graft.expressions.ChunkSpans].getName, "chunk_spans"),
      (args: Seq[Expression]) => graft.expressions.ChunkSpans(args.head,
        intArg(args(1), "chunk"), intArg(args(2), "stride"))),
    // content-defined chunking generator (alignment-robust span dedup)
    ("cdc_spans",
      new ExpressionInfo(classOf[graft.expressions.CdcSpans].getName, "cdc_spans"),
      (args: Seq[Expression]) => graft.expressions.CdcSpans(args.head,
        intArg(args(1), "window"), intArg(args(2), "base"),
        intArg(args(3), "modulus"), intArg(args(4), "divisor"))),
    // PQ asymmetric-distance score: sum over subspaces of luts[m][codes[m]]
    ("pq_adc_score",
      new ExpressionInfo(classOf[graft.expressions.PqAdcScore].getName, "pq_adc_score"),
      (args: Seq[Expression]) => graft.expressions.PqAdcScore(args.head, args(1))),
    // z-order equal-population bucket id; boundaries as a foldable array
    // literal, e.g. quantile_bucket(v, array(1.0, 2.5, 7.0))
    ("quantile_bucket",
      new ExpressionInfo(classOf[graft.expressions.QuantileBucket].getName, "quantile_bucket"),
      (args: Seq[Expression]) => graft.expressions.QuantileBucket(
        args.head, doubleArrayArg(args(1), "boundaries"))))

  private def doubleArrayArg(e: Expression, what: String): Array[Double] = {
    require(e.foldable, s"$what must be a literal array of doubles, got $e")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        e.dataType match {
          case org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, _) => a.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"$what must be array<double>, got ${other.simpleString(10)}")
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a literal array of doubles, got $other")
    }
  }

  private val arity: Map[String, Int] = Map(
    "shingle_hashes" -> 2, "minhash_sig" -> 3, "simhash64" -> 1,
    "shingle_strings" -> 2, "jaccard_sorted" -> 2, "text_stats" -> 1,
    "vec_dot" -> 2, "vec_cosine" -> 2, "vec_l2" -> 2, "quantize_i8" -> 1,
    "minhash_sig_md5" -> 3, "simhash60" -> 1, "nfc_normalize" -> 1,
    "chunk_spans" -> 3, "cdc_spans" -> 5, "pq_adc_score" -> 2,
    "quantile_bucket" -> 2)

  // fail at class-load, not at first invocation: a function added to
  // `functions` without an arity entry would otherwise surface as a bare
  // NoSuchElementException the first time a query calls it
  require(functions.forall { case (name, _, _) => arity.contains(name) },
    s"missing arity entries for: ${functions.map(_._1).filterNot(arity.contains).mkString(", ")}")

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      // arity-checked: a wrong argument count gets an analysis-time error
      // naming the function, not an IndexOutOfBoundsException (and extra
      // arguments are rejected, not silently ignored)
      val checked: Seq[Expression] => Expression = { args =>
        val n = arity(name)
        if (args.length != n) throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${args.length}")
        builder(args)
      }
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, checked)
    }
}
