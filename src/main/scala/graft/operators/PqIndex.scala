package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Product quantization (PQ) for embedding search — the compression half of
  * the FAISS IVF-PQ serving shape: each L2-normalized vector is split into
  * `m` contiguous subvectors, each subvector stored as the id of its
  * nearest centroid in a per-subspace codebook. A 64-dim float vector
  * (256 B) becomes `m` byte-sized codes (8 B at m=8, k<=256) — 32x
  * compression — and query-time scoring is `m` table lookups per candidate
  * (asymmetric distance / ADC) instead of a full float dot product.
  *
  * Scale design, mirroring [[IvfIndex]]:
  *   - codebooks train on a BOUNDED deterministic per-split-head sample
  *     (same corpus-spanning, shuffle-free shape as `IvfIndex.train` —
  *     see the bias discussion there) with fixed Lloyd iterations on the
  *     driver; the whole model is m*k*subDim doubles (16 KB at 8x256x8),
  *     a plan literal.
  *   - encoding is ONE narrow pass ([[graft.expressions.PqEncode]]): the
  *     codes table is the thing persisted/bucketed at ingest; the float
  *     vectors are only touched again by the exact re-rank.
  *   - ADC scoring joins the slim codes table against the broadcast
  *     per-query lookup tables ([[graft.expressions.PqAdcScore]]) — the
  *     corpus-side shuffle carries (id, m codes), never vectors.
  *   - cell pruning composes orthogonally: bucket the codes table by
  *     `ivf_cell` (as [[IvfIndex.saveAssigned]] does for floats) and the
  *     same probed-cell `IN` predicate prunes the ADC scan too.
  *
  * Ranking contract: vectors are normalized, so ADC scores approximate
  * cosine; exactness is recovered by re-ranking the top `candidates` with
  * true cosine (the s11 two-stage trick, oracled against the brute-force
  * ranking).
  */
object PqIndex {

  /** codebooks(m)(c) = centroid c of subspace m (subDim doubles). */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def subDim: Int = codebooks.head.head.length
  }

  /** Train per-subspace codebooks on the SAME deterministic per-split-head
    * sample and Lloyd discipline as `IvfIndex.train` — literally the same
    * code (`IvfIndex.sampleVectors` / `IvfIndex.lloyd`), so the sampling
    * bias and tie-break contracts cannot drift between the two trainers.
    * Vectors are L2-normalized BEFORE splitting — training, encoding, and
    * the query LUTs must all live in the same normalized space.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 256, sampleSize: Int = 2048, iters: Int = 10): Model = {
    require(m > 0 && k > 1, s"bad PQ shape m=$m k=$k")
    val sample = IvfIndex.sampleVectors(emb, idCol, vecCol, sampleSize).map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0.0) v.map(_ / n) else v
    }
    require(sample.nonEmpty, "empty PQ training set")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val books = Array.tabulate(m) { sub =>
      val subVecs = sample.map(_.slice(sub * subDim, (sub + 1) * subDim))
      IvfIndex.lloyd(subVecs, k, iters)
    }
    Model(books)
  }

  /** The m-code word for a vector — one expression node, one pass. */
  def encodeCol(v: Column, model: Model): Column =
    ColumnBridge.column(graft.expressions.PqEncode(
      ColumnBridge.expression(v), model.codebooks))

  /** (id, codes) table — what gets persisted at ingest. */
  def encode(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    emb.select(col(idCol), encodeCol(col(vecCol), model).as("codes"))

  /** Top-`candidates` ADC candidates per query: the codes table is scanned
    * once, each candidate scored by m table lookups against the broadcast
    * per-query LUTs. `queries` must be small (collected driver-side to
    * build the LUTs — the same bounded-query-set contract as
    * `Similarity.bruteForceTopK`'s broadcast).
    */
  def adcCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, candidates: Int = 100): DataFrame = {
    val spark = corpus.sparkSession
    val codes = encode(corpus, idCol, vecCol, model)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    // LUTs: luts(m)(c) = <normalized query subvector m, codebook[m][c]> —
    // computed once per query on the driver (queries x m x k doubles).
    // The id keeps ITS OWN type (a long cast would throw under ANSI for
    // string ids — the trap IvfIndex.sampleVectors documents).
    val idType = queries.schema(idCol).dataType
    val qRows = queries.select(col(idCol), col(vecCol).cast("array<double>"))
      .collect()
    val lutRows: Seq[org.apache.spark.sql.Row] = qRows.toSeq.map { r =>
      val v0 = r.getSeq[Double](1).toArray
      val n = math.sqrt(v0.map(x => x * x).sum)
      val v = if (n > 0.0) v0.map(_ / n) else v0
      val subDim = model.subDim
      val luts: Seq[Seq[Double]] = (0 until model.m).map { sub =>
        model.codebooks(sub).toSeq.map { cen =>
          var acc = 0.0; var i = 0
          while (i < subDim) {
            val idx = sub * subDim + i
            acc += (if (idx < v.length) v(idx) else 0.0) * cen(i)
            i += 1
          }
          acc
        }
      }
      org.apache.spark.sql.Row(r.get(0), luts)
    }
    import org.apache.spark.sql.types._
    val lutDf = spark.createDataFrame(
      java.util.Arrays.asList(lutRows: _*),
      StructType(Seq(StructField("query_id", idType, nullable = false),
        StructField("luts", ArrayType(ArrayType(DoubleType, containsNull = false),
          containsNull = false), nullable = false))))
    val scored = codes.crossJoin(broadcast(lutDf)) // broadcast nested loop
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        ColumnBridge.column(graft.expressions.PqAdcScore(
          ColumnBridge.expression(col("codes")),
          ColumnBridge.expression(col("luts")))).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= candidates)
      .select("query_id", "neighbor_id", "score")
  }
}
