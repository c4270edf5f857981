package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Pins the reshaping / HOF query surface added for SURVEY §2.2 breadth:
  * pivot, unpivot (melt), theta join, and the array higher-order-function +
  * stopword accounting used by the quality queries. The driver's DuckDB gate
  * checks the same ops at sf0.01; these tests pin semantics on tiny inputs.
  */
class ReshapeQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q22 two-pass exact percentiles are bit-identical to built-in percentile()") {
    // the distributed window+interpolation formulation must reproduce the
    // ImperativeAggregate's doubles EXACTLY (same (hi-pos)*vlo+(pos-lo)*vhi
    // arithmetic), or the DuckDB quantile_cont oracle would drift
    val got = graft.queries.RelationalQueries
      .queries("q22_percentiles")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    val want = sf("orders").groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == want, s"two-pass percentiles diverge:\n$got\nvs\n$want")
  }

  test("q50 exact-moment regression agrees with the built-in corr/regr_slope") {
    // the built-ins sum doubles in partition order (not engine-reproducible,
    // which is why q50 doesn't use them); they ARE the semantic truth to
    // within float noise, so pin the moment formulation against them
    val got = graft.queries.RelationalQueries
      .queries("q50_regression_aggs")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val want = sf("lineitem").groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("slope"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("intercept"),
        expr("corr(l_extendedprice, l_quantity)").as("corr"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet)
    for ((k, (s1, i1, c1)) <- got; (s2, i2, c2) = want(k)) {
      assert(math.abs(s1 - s2) < 1e-4, s"$k slope: $s1 vs builtin $s2")
      assert(math.abs(i1 - i2) < 1e-2, s"$k intercept: $i1 vs builtin $i2")
      // q50 rounds to 6 dp for the cross-engine hash; the builtin is full
      // precision, so agreement is to the rounding granularity
      assert(math.abs(c1 - c2) < 1e-6, s"$k corr: $c1 vs builtin $c2")
    }
  }

  test("pivot with explicit value list: absent combos are null, present are summed") {
    val df = Seq(("p1", "F", 10.0), ("p1", "F", 5.0), ("p1", "O", 1.0), ("p2", "O", 2.0))
      .toDF("prio", "status", "price")
    val wide = df.groupBy("prio").pivot("status", Seq("F", "O", "P"))
      .agg(sum(col("price").cast("decimal(18,6)")).cast("double"))
      .orderBy("prio")
    assert(wide.columns.toSeq == Seq("prio", "F", "O", "P"))
    val rows = wide.collect()
    assert(rows(0).getDouble(1) == 15.0 && rows(0).getDouble(2) == 1.0 && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 2.0 && rows(1).isNullAt(3))
  }

  test("unpivot is the exact inverse reshape: ids x metrics -> long rows") {
    val df = Seq((1L, 2.0, 3.0), (2L, 4.0, 5.0)).toDF("id", "m1", "m2")
    val long = df.unpivot(Array(col("id")), Array(col("m1"), col("m2")), "metric", "value")
    assert(long.count() == 4)
    assert(long.columns.toSeq == Seq("id", "metric", "value"))
    val back = long.groupBy("id").pivot("metric", Seq("m1", "m2")).agg(first("value"))
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("theta join on a small dim plans as broadcast nested loop") {
    val n1 = sf("nation").select(col("n_nationkey").as("a"))
    val n2 = sf("nation").select(col("n_nationkey").as("b"))
    val joined = n1.join(broadcast(n2), col("a") < col("b"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(joined.count() == 25L * 24 / 2) // strict upper triangle of 25 nations
  }

  test("array HOF accounting and stopword count are exact on known text") {
    val df = Seq((1L, "the cat and the hat"), (2L, "  ab   cd  ")).toDF("id", "text")
    val toks = TF.tokens(col("text"))
    val out = df.select(
      col("id"),
      TF.tokenCount(col("text")).as("n_tokens"),
      aggregate(transform(toks, x => length(x)), lit(0), (a, b) => a + b).as("sum_len"),
      size(array_distinct(toks)).as("n_distinct"),
      TF.stopwordCount(col("text"), Seq("the", "a", "and")).as("n_stop"))
      .orderBy("id").collect()
    assert(out(0).toSeq == Seq(1L, 5, 15, 4, 3)) // "the" twice -> 4 distinct, 3 stopwords
    assert(out(1).toSeq == Seq(2L, 2, 4, 2, 0))
  }
}
