package graft

import graft.operators.Bm25Index
import org.apache.spark.sql.functions._

/** Pins the BM25 build-once index (t36): postings/df/stats contents on a
  * hand-checkable corpus, the probe's ranking semantics, the bucket-pruned
  * probe plan, and versioned build-once reuse.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 4 scoreable docs + a NULL-text doc that must contribute nothing:
  // dl = 3, 2, 4, 2 (sum 11); df: a=2, b=2, c=2, d=1
  private def corpus = Seq(
    (1L, "a a b"), (2L, "a c"), (3L, "b b b c"), (4L, "d d"),
    (5L, null.asInstanceOf[String])).toDF("doc_id", "text")

  /** Wipe this prefix's residue from the shared warehouse: a PREVIOUS
    * JVM's run leaves locations behind while the in-memory catalog forgot
    * the tables, and saveAsTable then refuses the orphan location — the
    * exact cross-JVM failure mode VersionedTable documents (its versioned
    * names dodge it by construction; the plain-named spec tables must
    * clean up explicitly).
    */
  private def wipe(prefix: String): Unit = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.listStatus(wh).foreach { st =>
      if (st.getPath.getName.startsWith(prefix)) fs.delete(st.getPath, true) }
    spark.catalog.listTables().collect().map(_.name).filter(_.startsWith(prefix))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
  }

  test("bm25: index tables carry exact integer stats; probe ranks by hand-checkable BM25") {
    val name = "bm25spec_idx"
    wipe("bm25spec_idx")
    Bm25Index.build(corpus, "doc_id", "text", name, buckets = 4)
    val stats = spark.table(name + "_stats").head
    assert((stats.getLong(0), stats.getLong(1)) == ((4L, 11L)),
      s"stats (n_docs, sum_dl) wrong: $stats")
    val df = spark.table(name + "_df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 1L), df)
    // dl denormalized into postings: doc 3's rows all carry dl=4
    val p3 = spark.table(name).where(col("doc_id") === 3)
      .select("token", "tf", "dl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(p3 == Set(("b", 3L, 4L), ("c", 1L, 4L)), p3)

    // probe {b, c}: doc 3 matches both terms with the highest tf, doc 2
    // matches c with the shortest dl, doc 1 matches b once in a longer
    // doc, doc 4 matches nothing — BM25 ranks 3 > 2 > 1
    val top = Bm25Index.topK(spark, name, Seq("b", "c"), k = 10)
    val rows = top.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(3L, 2L, 1L),
      s"ranking wrong: ${rows.toSeq}")
    assert(rows.map(_._2).toSeq == Seq(2L, 1L, 1L),
      s"matched-term counts wrong: ${rows.toSeq}")
    assert(rows.map(_._3).forall(_ > 0) &&
        rows(0)._3 > rows(1)._3 && rows(1)._3 > rows(2)._3,
      s"scores not strictly decreasing: ${rows.toSeq}")
    // the probe plan prunes buckets via the literal term IN-list
    val plan = top.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.exists(m => m.group(1).toInt < m.group(2).toInt),
      s"probe did not prune buckets: ${sel.map(_.matched)}")
  }

  test("bm25: deterministic term selection honors the df cap and tie-break") {
    val name = "bm25spec_terms_idx"
    wipe("bm25spec_terms_idx")
    Bm25Index.build(corpus, "doc_id", "text", name, buckets = 4)
    // cap df*1 <= 4 admits every token; df desc then token asc
    assert(Bm25Index.selectTerms(spark, name, nTerms = 5, dfCapDenom = 1) ==
      Seq("a", "b", "c", "d"))
    // cap df*4 <= 4 admits only df=1 tokens
    assert(Bm25Index.selectTerms(spark, name, nTerms = 5, dfCapDenom = 4) ==
      Seq("d"))
  }

  test("hybrid rrf: the two rankers disagree where they should, the fusion is exact integer math") {
    // BM25's length normalization demotes the long spammy doc that raw
    // TF-IDF promotes: doc 1 (tf_b=6, dl=16) outranks doc 2 (tf_b=3,
    // dl=3) under TF-IDF but LOSES to it under BM25 (hand-checked:
    // n=3, sum_dl=21 -> bm25 doc1 ~1.58 < doc2 ~1.79)
    val name = "bm25spec_rrf_idx"
    wipe(name)
    Bm25Index.build(Seq(
      (1L, "b b b b b b x x x x x x x x x x"),
      (2L, "b b b"),
      (3L, "c c")).toDF("doc_id", "text"), "doc_id", "text", name, buckets = 4)
    val rows = Bm25Index.hybridRrfTopK(spark, name, Seq("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // ranks: bm25 doc2=1/doc1=2, tfidf doc1=1/doc2=2 — genuine
    // disagreement; rrf ties exactly (floor(1e6/61)+floor(1e6/62) both
    // ways = 16393+16129), doc_id breaks it
    assert(rows.toSeq == Seq((1L, 32522L, 2, 1), (2L, 32522L, 1, 2)),
      s"fusion wrong: ${rows.toSeq}")
    // non-circular arithmetic check: recompute rrf from the returned ranks
    rows.foreach { case (_, rrf, b, t) =>
      assert(rrf == 1000000L / (60 + b) + 1000000L / (60 + t))
    }
  }

  test("bm25: versioned build-once — the second ensure reuses, probes match") {
    def ensure() = graft.util.VersionedTable.ensure(
      spark, "bm25sv_", "bm25sv_idx",
      build = n => Bm25Index.build(corpus, "doc_id", "text", n, buckets = 4),
      usable = n => spark.catalog.tableExists(n) &&
        spark.catalog.tableExists(n + "_df") &&
        spark.catalog.tableExists(n + "_stats"),
      siblings = Bm25Index.siblings)
    val v1 = ensure()
    val v2 = ensure()
    assert(v1 == v2, s"second ensure rebuilt: $v1 vs $v2")
    val got = Bm25Index.topK(spark, v2, Seq("b", "c")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 2L, 1L), got)
  }
}
