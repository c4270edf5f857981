package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions: minhash_sig / simhash64 / shingle_hashes usable from spark.sql") {
    GraftExtensions.register(spark)
    Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "totally different words here"))
      .toDF("id", "text").createOrReplaceTempView("docs_ext")
    val rows = spark.sql(
      """SELECT id, minhash_sig(text, 3, 16) AS sig, simhash64(text) AS sh,
        |size(shingle_hashes(text, 3)) AS nsh FROM docs_ext ORDER BY id""".stripMargin)
      .collect()
    assert(rows(0).getSeq[Long](1) == rows(1).getSeq[Long](1)) // same text, same sig
    assert(rows(0).getSeq[Long](1) != rows(2).getSeq[Long](1))
    assert(rows(0).getLong(2) == rows(1).getLong(2))
    assert(rows(0).getInt(3) == 5) // 7 tokens -> 5 trigram shingles
  }

  test("SQL functions: text_stats / jaccard_sorted / vec_* usable from spark.sql") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox", Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("id", "text", "va", "vb").createOrReplaceTempView("docs_ext2")
    val r = spark.sql(
      """SELECT text_stats(text).n_tokens AS nt,
        |jaccard_sorted(shingle_hashes(text, 2), shingle_hashes(text, 2)) AS j,
        |vec_dot(va, vb) AS d, vec_cosine(va, va) AS c, vec_l2(va, vb) AS l,
        |size(shingle_strings(text, 2)) AS ns
        |FROM docs_ext2""".stripMargin).collect()(0)
    assert(r.getInt(0) == 4)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 1.0)
    assert(math.abs(r.getDouble(4) - math.sqrt(2.0)) < 1e-12)
    assert(r.getInt(5) == 3)
  }

  test("chunk_spans generator: SQL table function equals the substring composition") {
    GraftExtensions.register(spark)
    // edge lengths around the (chunk=5, stride=3) windows, plus multi-byte
    // chars (substring counts CODE POINTS), empty text, and NULL
    Seq((1L, "abcdefghij"), (2L, "abcde"), (3L, "abcdef"), (4L, "ab"),
      (5L, ""), (6L, null.asInstanceOf[String]), (7L, "héllo wörld €uro"))
      .toDF("id", "text").createOrReplaceTempView("docs_chunk")
    val gen = spark.sql(
      """SELECT id, c.chunk_idx, c.chunk_text
        |FROM docs_chunk LATERAL VIEW chunk_spans(text, 5, 3) c AS chunk_idx, chunk_text
        |ORDER BY id, chunk_idx""".stripMargin).collect()
    val ref = spark.sql(
      """SELECT id, pos AS chunk_idx, substring(text, pos * 3 + 1, 5) AS chunk_text
        |FROM (
        |  SELECT id, text,
        |    posexplode(sequence(0,
        |      CAST(ceil(CAST(greatest(length(text) - 5, 0) AS DOUBLE) / 3) AS INT))) AS (pos, x)
        |  FROM docs_chunk)
        |ORDER BY id, chunk_idx""".stripMargin).collect()
    assert(gen.length == ref.length, s"${gen.length} vs ${ref.length} rows")
    gen.zip(ref).foreach { case (g, r) => assert(g == r, s"$g != $r") }
    // NULL text yields one (0, NULL) row — matching greatest(NULL,0)=0 in
    // the composition; empty text yields one empty chunk
    assert(gen.filter(_.getLong(0) == 6L).map(r => (r.getInt(1), r.getString(2))).toSeq
      == Seq((0, null)))
    assert(gen.filter(_.getLong(0) == 5L).map(_.getString(2)).toSeq == Seq(""))
  }

  test("jaccard_sorted edges: empty arrays, disjoint, identical") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT jaccard_sorted(array(), array()) AS e,
        |jaccard_sorted(array(1L,2L), array(3L,4L)) AS disjoint,
        |jaccard_sorted(array(1L,2L,3L), array(1L,2L,3L)) AS same,
        |jaccard_sorted(array(1L,2L,3L,4L), array(3L,4L,5L,6L)) AS half
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 2.0 / 6.0)
  }

  test("pq_adc_score and quantile_bucket are SQL-callable") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  pq_adc_score(array(0, 2), array(array(0.5D, 1.0D, 1.5D),
        |                                  array(10.0D, 20.0D, 30.0D))) AS adc,
        |  quantile_bucket(3.5D, array(1.0D, 2.0D, 5.0D)) AS qb,
        |  quantile_bucket(CAST(NULL AS DOUBLE), array(1.0D)) AS qbnull
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 0.5 + 30.0) // luts[0][0] + luts[1][2]
    assert(r.getLong(1) == 2L)           // two boundaries <= 3.5
    assert(r.getLong(2) == 0L)           // null -> bucket 0
    // non-literal boundaries are rejected with a readable message
    val e = intercept[Exception](spark.sql(
      "SELECT quantile_bucket(1.0D, array(rand())) ").collect())
    assert(e.getMessage.contains("boundaries") || e.getMessage.contains("literal"),
      e.getMessage)
  }

  test("pq_adc_score rejects wrong element widths at ANALYSIS time") {
    GraftExtensions.register(spark)
    // array<bigint> codes: getInt on an UnsafeArrayData of longs would
    // read the wrong element width and silently corrupt the ranking —
    // must fail analysis, not return garbage
    val e1 = intercept[Exception](spark.sql(
      "SELECT pq_adc_score(array(0L, 2L), array(array(0.5D), array(1.0D)))").collect())
    assert(e1.getMessage.toLowerCase.contains("array<int>") ||
      e1.getMessage.contains("pq_adc_score"), e1.getMessage)
    // array<array<float>> luts: same trap on the read side
    val e2 = intercept[Exception](spark.sql(
      "SELECT pq_adc_score(array(0, 1), array(array(CAST(0.5 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT))))").collect())
    assert(e2.getMessage.contains("pq_adc_score"), e2.getMessage)
  }

  test("extensions class injects without error (for spark.sql.extensions wiring)") {
    // a shared test session already exists, so we can't observe a fresh
    // session build here; assert the injection path itself is sound
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
