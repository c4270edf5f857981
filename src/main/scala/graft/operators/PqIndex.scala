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

  /** Train per-subspace codebooks on a deterministic per-split-head sample
    * (the `IvfIndex.train` sampling shape: corpus-spanning, one job, no
    * shuffle, replayable under task retries). Vectors are L2-normalized
    * BEFORE splitting — training, encoding, and the query LUTs must all
    * live in the same normalized space.
    */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 256, sampleSize: Int = 2048, iters: Int = 10): Model = {
    require(m > 0 && k > 1, s"bad PQ shape m=$m k=$k")
    val projected = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val rdd = projected.rdd
    val nSplits = math.max(1, rdd.getNumPartitions)
    val step = math.max(1, nSplits / sampleSize)
    val perSplit = math.max(1, math.ceil(sampleSize.toDouble / nSplits).toInt)
    val collected = rdd.mapPartitionsWithIndex { (idx, it) =>
      if (idx % step == 0) it.take(perSplit) else Iterator.empty
    }.collect()
    val sorted = collected.sortBy(_.getLong(0))
    val picked = if (sorted.length <= sampleSize) sorted
      else Array.tabulate(sampleSize)(i =>
        sorted((i.toLong * sorted.length / sampleSize).toInt))
    val sample = picked.map { r =>
      val v = r.getSeq[Double](1).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0.0) v.map(_ / n) else v
    }
    require(sample.nonEmpty, "empty PQ training set")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m
    val books = Array.tabulate(m) { sub =>
      val subVecs = sample.map(_.slice(sub * subDim, (sub + 1) * subDim))
      lloyd(subVecs, k, iters)
    }
    Model(books)
  }

  /** Driver-side Lloyd with even-stride init over the (id-sorted) sample —
    * identical discipline to `IvfIndex.train`'s clustering loop: squared
    * L2, lowest-id tie-break, empty clusters keep their previous centroid.
    */
  private def lloyd(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    var centroids =
      if (sample.length <= k) sample.map(_.clone())
      else Array.tabulate(k)(i => sample((i.toLong * sample.length / k).toInt).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val cen = centroids(c)
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - cen(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    centroids
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
    // computed once per query on the driver (queries x m x k doubles)
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
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
      org.apache.spark.sql.Row(r.getLong(0), luts)
    }
    import org.apache.spark.sql.types._
    val lutDf = spark.createDataFrame(
      java.util.Arrays.asList(lutRows: _*),
      StructType(Seq(StructField("query_id", LongType, nullable = false),
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
