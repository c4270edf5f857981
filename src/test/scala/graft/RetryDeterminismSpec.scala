package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, IvfIndex, SkewJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-shot task-failure injector: kills the FIRST attempt of the first
  * task that evaluates it after arming, then lets the retry (and everything
  * else) through. `.asNondeterministic()` keeps the optimizer from folding
  * or reordering the probe away.
  */
object RetryFault {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
  def arm(): Unit = { armed.set(true); fired.set(false) }
}

/** At 100 TB task retries are ROUTINE (spot loss, speculation, fetch
  * failures), so every operator must produce bit-identical output when any
  * task runs twice. The seeded hyperplanes, deterministic per-split
  * sampling, and salted hashes are DESIGNED for that; these tests pin it by
  * injecting a one-shot first-attempt failure into a task of each pipeline
  * family and asserting output equality with the clean run (round-9 verdict
  * item #4 — the proof that was previously only argued).
  */
class RetryDeterminismSpec extends SparkSpec {

  /** Pass-through filter carrying the one-shot fault probe. */
  private def faulted(df: DataFrame): DataFrame = {
    val probe = udf { () =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          RetryFault.armed.compareAndSet(true, false)) {
        RetryFault.fired.set(true)
        throw new RuntimeException(
          s"injected one-shot failure (partition ${tc.partitionId()}, attempt 0)")
      }
      true
    }.asNondeterministic()
    df.filter(probe())
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def docs: DataFrame = {
    val d = sf("documents", "/root/testdata/sf0.01").select("doc_id", "text")
    val mutated = d.select((col("doc_id") + 1000000L).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    d.unionByName(mutated)
  }

  test("LSH dedup pairs are bit-identical under a mid-pipeline task retry") {
    val clean = rows(Dedup.minhashPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
      sigFn = TF.minhashSignatureMd5))
    RetryFault.arm()
    val retried = rows(Dedup.minhashPairs(faulted(docs), "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
      sigFn = TF.minhashSignatureMd5))
    assert(RetryFault.fired.get(), "fault never fired — the probe was optimized away")
    assert(clean.nonEmpty && retried == clean,
      s"LSH pairs diverged under retry: ${clean.size} vs ${retried.size} rows")
  }

  test("IVF training sample + probe are bit-identical under a task retry") {
    val e = sf("embeddings", "/root/testdata/sf0.01").select("vec_id", "embedding")
    val qs = e.where(col("vec_id") < 10)
    val cleanModel = IvfIndex.train(e, "vec_id", "embedding", k = 8)
    RetryFault.arm()
    // the fault lands inside train()'s per-split-head sample job — the
    // retried split must hand back the SAME head rows
    val retriedModel = IvfIndex.train(faulted(e), "vec_id", "embedding", k = 8)
    assert(RetryFault.fired.get(), "fault never fired in the training sample job")
    assert(retriedModel.centroids.map(_.toSeq).toSeq ==
      cleanModel.centroids.map(_.toSeq).toSeq,
      "IVF centroids diverged under a training-sample task retry")
    val cleanTopK = rows(IvfIndex.topK(e, qs, "vec_id", "embedding",
      cleanModel, k = 5, nprobe = 6))
    RetryFault.arm()
    val retriedTopK = rows(IvfIndex.topK(faulted(e), qs, "vec_id", "embedding",
      retriedModel, k = 5, nprobe = 6))
    assert(RetryFault.fired.get(), "fault never fired in the probe job")
    assert(cleanTopK.nonEmpty && retriedTopK == cleanTopK,
      "IVF top-k diverged under a probe task retry")
  }

  test("carried-payload embedding pairs are bit-identical under a task retry") {
    // round 11 rewired embeddingPairs (vectors ride the bucket self-join,
    // verify inline, distinct post-verify) — the retry contract must hold
    // for the NEW shuffle structure, not just the old attach shape
    val e = sf("embeddings", "/root/testdata/sf0.01").select("vec_id", "embedding")
    val nd = e.unionByName(e.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.01f)).as("embedding")))
    def pairs(in: DataFrame) = Dedup.embeddingPairs(in, "vec_id", "embedding",
      minCosine = 0.999, numPlanes = 8, dim = 64, tables = 8,
      targetBucketSize = 32, corpusSizeHint = 2L * e.count())
    val clean = rows(pairs(nd))
    RetryFault.arm()
    val retried = rows(pairs(faulted(nd)))
    assert(RetryFault.fired.get(), "fault never fired in the carried bucket join")
    assert(clean.nonEmpty && retried == clean,
      s"embedding pairs diverged under retry: ${clean.size} vs ${retried.size} rows")
  }

  test("CDC index merge is bit-identical under a task retry") {
    import graft.operators.PqIndex
    val e = sf("embeddings", "/root/testdata/sf0.01").select("vec_id", "embedding")
    val ivf = IvfIndex.train(e, "vec_id", "embedding", k = 8)
    val pq = PqIndex.train(e, "vec_id", "embedding", m = 16, k = 64)
    val delta = e.where(col("vec_id") < 5)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"),
        lit("upsert").as("op"))
    def encoded(in: DataFrame) =
      rows(PqIndex.encodeDelta(in, "vec_id", "embedding", ivf, pq))
    val clean = encoded(delta)
    RetryFault.arm()
    val retried = encoded(faulted(delta))
    assert(RetryFault.fired.get(), "fault never fired in the delta encode")
    assert(clean.nonEmpty && retried == clean,
      "encoded delta (cells + code words) diverged under a task retry")
  }

  test("salted join output is bit-identical under a task retry") {
    val li = sf("lineitem", "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val part = sf("part", "/root/testdata/sf0.01").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    def join(fact: DataFrame) = SkewJoin.saltedJoin(fact, part, "l_partkey",
      salts = 8, tiebreak = Seq("l_orderkey"))
    val clean = rows(join(li))
    RetryFault.arm()
    val retried = rows(join(faulted(li)))
    assert(RetryFault.fired.get(), "fault never fired in the salted join")
    assert(clean.nonEmpty && retried == clean,
      s"salted join diverged under retry: ${clean.size} vs ${retried.size} rows")
  }
}
