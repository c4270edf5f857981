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

  test("extensions class injects without error (for spark.sql.extensions wiring)") {
    // a shared test session already exists, so we can't observe a fresh
    // session build here; assert the injection path itself is sound
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
  }
}
