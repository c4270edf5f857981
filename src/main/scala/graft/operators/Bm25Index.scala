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

  /** BM25 top-k over the persisted index for a literal bag of terms.
    * Output: (doc_id, n_terms matched, score), score DESC / doc_id ASC,
    * k rows. The term IN-list is literal, so the bucketed scan prunes to
    * the probed terms' buckets; df joins broadcast (terms-sized), stats
    * is one broadcast row. Long arithmetic note: dl*n_docs stays exact
    * below ~2^63 — 1e9 docs x 1e9 total tokens needs the split into
    * (dl * n_docs) / sum_dl kept as (dl / avgdl) doubles instead; at that
    * point revisit, the fixture-to-100TB range is safe.
    */
  def topK(spark: SparkSession, name: String, terms: Seq[String],
      k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "bm25 topK: empty term set")
    val postings = spark.table(name).where(col("token").isin(terms: _*))
    val termDf = spark.table(name + "_df").where(col("token").isin(terms: _*))
    val stats = spark.table(name + "_stats")
    // each component mirrors the DuckDB oracle token for token: idf's +1
    // floor, tf*(k1+1) with k1+1 = 2.2 literal, (1-b) = 0.25, b = 0.75,
    // dl/avgdl as the exact integer product (dl*n_docs)/sum_dl
    val comp = postings
      .join(broadcast(termDf), "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
            col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
              (col("dl") * col("n_docs")) / col("sum_dl").cast("double"))),
          6).as("comp"))
    comp.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("comp").cast(DecimalType(18, 6))).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
