package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Build-once BM25 lexical retrieval index — the LEXICAL sibling of the
  * serving-side ANN indexes (s12 IVF, d19's decontamination hashes): the
  * corpus text is tokenized ONCE at build time into a slim postings table
  * bucketed by term, and every later query probes the postings without
  * ever re-scanning document text. Published scoring (Robertson-Sparck
  * Jones BM25, the Okapi formulation with the +1 idf floor Lucene uses so
  * common terms never score negative):
  *
  *   score(q, d) = sum over t in q of
  *     ln(1 + (N - df + 0.5)/(df + 0.5))
  *       * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  *
  * with k1 = 1.2, b = 0.75 (the standard defaults).
  *
  * Scale shape: the build is one tokenize pass + one (doc, token) groupBy
  * — linear in corpus bytes, the same cost profile as t16's TF-IDF. The
  * postings are bucketed by token, so a probe's literal term IN-list
  * prunes buckets at the scan (SelectedBucketsCount — gated in-query by
  * t36) and touches only the probed terms' postings; document length is
  * denormalized INTO the postings row so the probe joins nothing
  * corpus-sized. Top-k lands via orderBy+limit (TakeOrdered — per-partition
  * top-k then a driver merge of k-row heaps, never a single-partition
  * window).
  *
  * Cross-engine determinism (the t16 discipline): tf/df/dl/N are exact
  * integers; each per-(term, doc) score component is one deterministic
  * double expression ROUNDED to 6 decimals per row, and the per-doc sum
  * accumulates those rounded components as DECIMAL(18,6) — exact and
  * addition-order-free — so the final score is independent of
  * partitioning on either engine. Ranking orders by (score DESC, doc_id
  * ASC) AFTER rounding, so ties resolve identically.
  *
  * The reference has no retrieval surface (its text handling is CSV field
  * parsing, `/root/reference/src/reader_csv.rs`); this is a beyond-
  * reference operator for eval-leak auditing and corpus search, the
  * build-once discipline of d19/s12 applied to lexical scoring.
  */
object Bm25Index {

  /** Build the index tables under the versioned `name`:
    *   - `<name>`        postings (token, doc_id, tf, dl), bucketed+sorted
    *                     by token — dl denormalized so probes stay slim;
    *   - `<name>_df`     (token, df) — vocabulary-sized, for idf and for
    *                     deterministic query-term selection;
    *   - `<name>_stats`  one row (n_docs, sum_dl) — avgdl's exact integer
    *                     numerator/denominator (never a stored float).
    * NULL-text docs contribute nothing (no tokens — same rule as t16).
    */
  def build(docs: DataFrame, idCol: String, textCol: String, name: String,
      buckets: Int = 16): Unit = {
    // ONE tokenize pass (t16's materialization discipline): tf is the
    // aggregated (doc, token, tf) table, far smaller than the text, and
    // all three outputs derive from it
    val tf = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokensFast(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    Bucketing.writeBucketed(
      tf.join(dl, "doc_id").select("token", "doc_id", "tf", "dl"),
      name, "token", buckets)
    tf.groupBy("token").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").format("parquet").saveAsTable(name + "_df")
    dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .write.mode("overwrite").format("parquet").saveAsTable(name + "_stats")
  }

  /** The sibling artifact names retention must keep alongside a version. */
  def siblings(name: String): Seq[String] = Seq(name + "_df", name + "_stats")

  /** Merge a DELTA index (one batch's own [[build]]) into a prior index,
    * writing the merged trio under `out` — the CDC-maintenance primitive
    * (st21). Every merge is associative + commutative over doc-disjoint
    * batches (each document's text arrives in exactly one batch):
    * postings rows simply union (tf/dl are doc-local), df sums per token,
    * the stats row adds — so ANY batch split merges to EXACTLY the
    * one-shot build, which is what lets t36's oracle pin the
    * incrementally-maintained index verbatim. The postings rewrite here
    * is index-sized per merge; a production deployment appends
    * bucket-aligned files instead of rewriting (the df/stats merge is the
    * content that genuinely needs arithmetic).
    */
  def mergeInto(spark: SparkSession, prior: Option[String], delta: String,
      out: String, buckets: Int = 16): Unit = {
    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").format("parquet").saveAsTable(name)
    prior match {
      case None =>
        Bucketing.writeBucketed(spark.table(delta), out, "token", buckets)
        save(spark.table(delta + "_df"), out + "_df")
        save(spark.table(delta + "_stats"), out + "_stats")
      case Some(p) =>
        Bucketing.writeBucketed(
          spark.table(p).unionByName(spark.table(delta)), out, "token", buckets)
        save(spark.table(p + "_df").unionByName(spark.table(delta + "_df"))
          .groupBy("token").agg(sum("df").as("df")), out + "_df")
        save(spark.table(p + "_stats").unionByName(spark.table(delta + "_stats"))
          .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl")),
          out + "_stats")
    }
  }

  /** Deterministic data-derived query terms: the `nTerms` highest-df
    * tokens whose df stays under n_docs/dfCapDenom (stopword-saturated
    * terms carry ~zero idf and make every score a tie), ties broken by
    * token ascending — integer/string ordering, engine-exact. Reads the
    * vocabulary-sized df table, never the postings or the corpus.
    */
  def selectTerms(spark: SparkSession, name: String, nTerms: Int = 5,
      dfCapDenom: Int = 20): Seq[String] = {
    val nDocs = spark.table(name + "_stats").select("n_docs").head.getLong(0)
    spark.table(name + "_df")
      .where(col("df") * dfCapDenom <= nDocs)
      .orderBy(col("df").desc, col("token").asc)
      .limit(nTerms).select("token").collect().map(_.getString(0)).toSeq
  }

  /** The pruned per-(term, doc) probe frame: postings rows for the
    * literal term set (bucket-pruned scan) joined with the terms-sized df
    * frame and the 1-row stats — the shared input of every scorer.
    */
  private def probeRows(spark: SparkSession, name: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 probe: empty term set")
    spark.table(name).where(col("token").isin(terms: _*))
      .join(broadcast(
        spark.table(name + "_df").where(col("token").isin(terms: _*))), "token")
      .crossJoin(broadcast(spark.table(name + "_stats")))
  }

  /** Per-(term, doc) BM25 component, ROUND(,6)'d — mirrors the DuckDB
    * oracle token for token: idf's +1 floor, tf*(k1+1) with k1+1 = 2.2
    * literal, (1-b) = 0.25, b = 0.75, dl/avgdl as the exact integer
    * product (dl*n_docs)/sum_dl. Long arithmetic note: dl*n_docs stays
    * exact below ~2^63 — 1e9 docs x 1e9 total tokens needs the split
    * kept as (dl / avgdl) doubles instead; the fixture-to-100TB range
    * is safe.
    */
  private def bm25Component: org.apache.spark.sql.Column =
    round(
      log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5))) *
        col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl") * col("n_docs")) / col("sum_dl").cast("double"))),
      6)

  /** Per-(term, doc) TF-IDF component (t16's exact formula), ROUND(,6)'d. */
  private def tfidfComponent: org.apache.spark.sql.Column =
    round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6)

  /** Sum rounded components per doc as exact DECIMAL (order-free). */
  private def scored(rows: DataFrame, component: org.apache.spark.sql.Column): DataFrame =
    rows.select(col("doc_id"), component.as("comp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("comp").cast(DecimalType(18, 6))).cast("double").as("score"))

  /** BM25 top-k over the persisted index for a literal bag of terms.
    * Output: (doc_id, n_terms matched, score), score DESC / doc_id ASC,
    * k rows via TakeOrdered (never a global window).
    */
  def topK(spark: SparkSession, name: String, terms: Seq[String],
      k: Int = 10): DataFrame =
    scored(probeRows(spark, name, terms), bm25Component)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher 2009): two rankers over the SAME pruned probe — BM25
    * (length-normalized, saturating tf) and plain TF-IDF (raw tf) — each
    * cut to its top-m by (rounded score DESC, doc_id ASC), fused as
    *
    *   rrf(d) = sum over rankers of floor(1e6 / (60 + rank_d))
    *
    * — the standard k=60 RRF in exact INTEGER micro-units, so the fusion
    * is engine-exact by construction (ranks are integers, the component
    * orderings are deterministic per the t36 discipline). Docs outside a
    * ranker's top-m contribute 0 from it. Output: (doc_id, rrf_micros,
    * bm25_rank, tfidf_rank) — the nullable ranks make each ranker's
    * contribution auditable.
    *
    * Scale shape: the probe is the same bucket-pruned scan; each ranker's
    * cut is a TakeOrdered; rank assignment windows over the m-row cut
    * (m = 20 — driver-bounded, deliberately single-partition); the fusion
    * is an m-row full-outer join. Nothing corpus-sized past the scorers.
    */
  def hybridRrfTopK(spark: SparkSession, name: String, terms: Seq[String],
      k: Int = 10, m: Int = 20, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = probeRows(spark, name, terms)
    def ranked(component: org.apache.spark.sql.Column, rankName: String) =
      scored(rows, component)
        .orderBy(col("score").desc, col("doc_id").asc).limit(m)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)).as(rankName))
    val fused = ranked(bm25Component, "bm25_rank")
      .join(ranked(tfidfComponent, "tfidf_rank"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(expr(s"1000000 div ($rrfK + bm25_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($rrfK + tfidf_rank)"), lit(0L)))
          .as("rrf_micros"),
        col("bm25_rank"), col("tfidf_rank"))
    fused.orderBy(col("rrf_micros").desc, col("doc_id").asc).limit(k)
  }
}
