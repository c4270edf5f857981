package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall of the approximate ANN paths (s02 LSH, s03 IVF) against the exact
  * brute-force ranking (s01) on the real embeddings fixture, with the SAME
  * parameters the driver queries use. The driver's correctness gate can only
  * check s02/s03 rows-count (approximate results are engine-specific) plus
  * the per-query `recall` column requireRecall appends to the artifact, so
  * this is the guard against silent recall regressions from parameter drift.
  */
class AnnRecallSpec extends SparkSpec {

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val emb = sf("embeddings").select("vec_id", "embedding")
  private lazy val queries = emb.where(col("vec_id") < 10)
  private lazy val exact =
    pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))

  test("LSH top-k (s02 parameters) recall@5 >= 0.9 vs exact ranking") {
    val lsh = pairs(Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 5, numPlanes = 4, tables = 6, dim = 64, probes = 4))
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"LSH recall@5 = $recall%.3f (${(lsh & exact).size}/${exact.size})")
    assert(recall >= 0.9, f"LSH recall@5 regressed: $recall%.3f < 0.9")
  }

  test("requireRecall throws on a recall collapse (the driver-visible err path)") {
    // 16 planes x 1 table, no multi-probe: per-bucket collision probability
    // for a cosine-0.3 neighbor is ~0.6^16 ~ 3e-4 — recall collapses, and
    // the inline gate s02/s03 run through must throw, turning a silent
    // parameter regression into a hard correctness err
    val broken = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 5, numPlanes = 16, tables = 1, dim = 64, probes = 0)
    val exactDf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val e = intercept[IllegalArgumentException] {
      Similarity.requireRecall(broken, exactDf, 0.9, "broken-params")
    }
    assert(e.getMessage.contains("recall"))
  }

  test("IVF top-k (s03 parameters) recall@5 >= 0.9 vs exact ranking") {
    val model = IvfIndex.train(emb, "vec_id", "embedding", k = 8)
    val ivf = pairs(IvfIndex.topK(emb, queries, "vec_id", "embedding",
      model, k = 5, nprobe = 6))
    val recall = (ivf & exact).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.3f (${(ivf & exact).size}/${exact.size})")
    assert(recall >= 0.9, f"IVF recall@5 regressed: $recall%.3f < 0.9")
  }

  test("stratified training survives a content-sorted multi-split corpus") {
    import spark.implicits._
    // 8 tight clusters at distinct corners of R^16, SORTED by cluster and
    // range-partitioned so each split holds one content region — the regime
    // where a head-only limit() sample would train every centroid from
    // cluster 0 and recall would collapse
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 800).map { i =>
      val c = i / 100 // cluster id, contiguous: split k holds cluster k only
      val center = Array.tabulate(16)(d => if ((c >> (d % 3)) % 2 == 0) 4.0f else -4.0f)
      (i.toLong, center.map(x => x + rnd.nextFloat() * 0.2f).toSeq)
    }
    val sorted = vecs.toDF("vec_id", "embedding")
      .repartitionByRange(8, col("vec_id"))
      .sortWithinPartitions("vec_id")
      .localCheckpoint() // pin the 8-split content-sorted layout
    // sampleSize < one split's rows: a head take would see ONLY split 0
    val model = IvfIndex.train(sorted, "vec_id", "embedding", k = 8, sampleSize = 64)
    val q = sorted.where(col("vec_id") % 100 === 0) // one query per cluster
    val exactQ = pairs(Similarity.bruteForceTopK(sorted, q, "vec_id", "embedding", k = 5))
    val ivf = pairs(IvfIndex.topK(sorted, q, "vec_id", "embedding", model, k = 5, nprobe = 2))
    val recall = (ivf & exactQ).size.toDouble / exactQ.size
    info(f"content-sorted IVF recall@5 = $recall%.3f")
    assert(recall >= 0.9, f"stratified training failed on content-sorted corpus: $recall%.3f")
    // determinism: same input -> identical centroids
    val model2 = IvfIndex.train(sorted, "vec_id", "embedding", k = 8, sampleSize = 64)
    assert(model.centroids.map(_.toSeq).toSeq == model2.centroids.map(_.toSeq).toSeq)
  }

  test("autoNlist holds probed-cell occupancy ~sqrt(n): probe cost does not grow linearly") {
    import spark.implicits._
    // the s14/s12 soak legs pin nlist=8 for the oracle regime, so their
    // probe walls grow with corpus/8 — this test is the evidence for the
    // documented warehouse path: with nlist = autoNlist(n) ~ sqrt(n), a
    // 16x corpus grows the probed cell by ~4x, not 16x
    def corpus(n: Int): DataFrame = {
      val rnd = new scala.util.Random(13)
      (0 until n).map { i =>
        (i.toLong, Array.tabulate(16)(_ => rnd.nextFloat() * 2 - 1).toSeq)
      }.toDF("vec_id", "embedding")
    }
    def probedOccupancy(n: Int): (Int, Double) = {
      val e = corpus(n).localCheckpoint()
      val nlist = IvfIndex.autoNlist(n)
      val model = IvfIndex.train(e, "vec_id", "embedding", k = nlist)
      val assigned = IvfIndex.assign(e, "vec_id", "embedding", model)
      // mean occupancy over the cells the 5 lowest-id queries would probe
      val q = e.where(col("vec_id") < 5)
      val cells = q.select(explode(graft.functions.VectorFunctions
          .nearestCells(col("embedding"), model.centroids, 1)).as("c"))
        .distinct().collect().map(_.getInt(0)).toSet
      val occ = assigned.where(col("ivf_cell").isin(cells.toSeq.map(Int.box): _*))
        .count().toDouble / cells.size
      (nlist, occ)
    }
    val (nlistS, occS) = probedOccupancy(1024)
    val (nlistL, occL) = probedOccupancy(16 * 1024)
    info(f"n=1024: nlist=$nlistS occ=$occS%.1f; n=16384: nlist=$nlistL occ=$occL%.1f")
    assert(nlistL > 3 * nlistS, s"autoNlist must grow with the corpus: $nlistS -> $nlistL")
    // 16x corpus, sqrt-sized cells: occupancy should grow ~4x; allow 2x
    // slack for imbalance, and require it is far under linear (16x)
    assert(occL <= 8 * occS,
      f"probed-cell occupancy grew ${occL / occS}%.1fx for 16x corpus — probe cost is not sqrt-bounded")
  }

  test("requireRecall leaves no cached frames behind (unpersist hygiene)") {
    // snapshot-delta, not global emptiness: suites share one sequential
    // forked JVM, and EARLIER suites legitimately leave localCheckpoint
    // RDDs behind (Dedup.clusters, IvfIndex.topK) that catalog.clearCache
    // does NOT remove (they are not CacheManager entries) — only RDDs NEW
    // since this call may be charged to requireRecall
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 5, numPlanes = 4, tables = 6, dim = 64, probes = 4)
    val exactDf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val out = Similarity.requireRecall(approx, exactDf, 0.9, "hygiene-test")
    // result is fully usable after the gate...
    assert(out.count() > 0)
    // ...carries the measured per-query recall (persisted into the verify
    // artifact, so the driver's rows-only record pins the number itself)...
    assert(out.columns.contains("recall"))
    val recalls = out.select("recall").distinct().collect().map(_.getDouble(0))
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    // ...and NOTHING stays persisted: each s02/s03/s05 invocation used to
    // strand one cached frame per call in a long-lived session. A true
    // leak never drains (nothing ever unpersists it); the short drain
    // wait is belt-and-suspenders against transient persists from any
    // concurrently running code (harmless today with sequential suites,
    // load-bearing if testForkedParallel is ever enabled)
    def leakedNow() = spark.sparkContext.getPersistentRDDs.filterNot {
      case (id, _) => before.contains(id)
    }
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (leakedNow().nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    val leaked = leakedNow()
    assert(leaked.isEmpty, s"stranded cached RDDs: ${leaked.values.map(_.name)}")
  }

  test("s05 bucketed-IVF driver query: green end-to-end with inline gates") {
    val df = SparkEntry.queries("s05_knn_ivf_bucketed")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 50, s"expected 10 queries x 5 neighbors, got ${rows.length}")
    // table cleaned up after the query
    assert(!spark.catalog.tableExists(s"s05_ivf_assigned_${math.abs("/root/testdata/sf0.001".hashCode)}"))
  }

  test("s17 MMR rerank: k distinct picks per query, greedy invariants hold") {
    val rows = SparkEntry.queries("s17_mmr_rerank")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 50, s"expected 10 queries x 5 steps, got ${rows.length}")
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, sel) =>
      assert(sel.map(_._3).sorted.toSeq == (1 to 5), s"query $q steps must be 1..5")
      assert(sel.map(_._2).distinct.length == 5, s"query $q picked a duplicate")
      // step 1 is pure relevance: every planted vector carries a strong
      // q component, so the top quantized dot is always a planted id
      // (which planted FAMILY wins varies — max-abs quantization keeps
      // direction but not per-vector scale, so the dot is not strictly
      // cosine-ordered; the greedy walk is exact either way)
      val first = sel.find(_._3 == 1).get._2
      assert(first >= 100000L,
        s"query $q step-1 pick $first is not a planted high-relevance vector")
    }
    // diversification is observable somewhere in the fixture — in one of
    // its two regimes: either a query picks a NATURAL corpus vector while
    // higher-relevance planted candidates remain unselected (lambda=0.5's
    // anything-orthogonal-beats-a-duplicate behavior, the sf0.001 shape),
    // or a query interleaves a moderately-relevant distinct vector
    // (200000+) before exhausting the tight cluster (the sf0.01 shape).
    // Pure relevance order everywhere would mean the penalty term is dead.
    val diversified = byQuery.values.exists { sel =>
      val pickedNaturalOverPlanted =
        sel.exists(_._2 < 100000L) && sel.count(_._2 >= 100000L) < 5
      val firstB = sel.filter(t => t._2 >= 200000L).map(_._3).minOption
      val lastA = sel.filter(t => t._2 >= 100000L && t._2 < 200000L).map(_._3).maxOption
      val interleaved = (firstB, lastA) match {
        case (Some(b), Some(a)) => b < a
        case _ => false
      }
      pickedNaturalOverPlanted || interleaved
    }
    assert(diversified, "every query returned pure relevance order — " +
      "the penalty term is not biting")
  }
}
