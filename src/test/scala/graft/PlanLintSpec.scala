package graft

/** Whole-surface plan lint: every declared query is built (which also runs
  * any in-query gates/writes its construction performs) and screened for
  * two scale-killers that can creep in silently:
  *
  *   - an UNCONDITIONAL cartesian product (`CartesianProduct` — the
  *     all-pairs shuffle join; the deliberate broadcast nested loops the
  *     ANN/top-k family uses plan as `BroadcastNestedLoopJoin` and are
  *     allowed);
  *   - a cache LEAK: a query whose construction persists something and
  *     forgets to unpersist grows a long-lived session forever (the
  *     round-8 s02/s03 leak class — requireRecall now cleans up after
  *     itself, and this lint keeps it that way for every future query).
  *     Queries that return a plan over a `localCheckpoint` legitimately
  *     leave that ONE materialized RDD behind (it backs the returned
  *     DataFrame and is released by the ContextCleaner when the consumer
  *     drops it) — those are declared below and unpersisted by the lint;
  *     anything undeclared must leave the persistent-RDD set untouched.
  *
  * Runs at sf0.01 (the driver's verify scale, where every in-query gate is
  * known to hold).
  */
class PlanLintSpec extends SparkSpec {

  /** Queries whose RESULT is built over localCheckpoint'd RDDs (candidate
    * sets, per-round closure frontiers) — new persistent entries after
    * construction are by-design there, bounded, and consumer-lifetime.
    */
  private val checkpointBacked = Set(
    "d09_dedup_clusters", "d12_best_survivors", "d14_semantic_curation",
    // d25 runs the same clusters() closure as d09/d12 (checkpointed edge
    // table + final round frontier back the returned labels); t34 consumes
    // d25's quota survivors, so it carries the same closure residue
    "d25_cluster_quota", "t34_upweighted_mixture",
    // (s17 left this set in round 17: the single-pass mapGroups walk
    // replaced its per-round checkpoints — no residue to declare)
    "s05_knn_ivf_bucketed", "s11_two_stage_knn", "s12_knn_ivf_serve",
    "s13_knn_pq_adc", "s14_knn_ivfpq_serve", "s15_knn_ivfpq_filtered",
    "d16_ann_index_cdc", "st12_ann_index_stream",
    // t16 materializes its aggregated (doc, token, tf) table so the text
    // is tokenized once for both consumers (df window + n_docs count)
    "t16_tfidf",
    // the incremental-dedup paths materialize their (tiny) candidate list
    // so its id sets broadcast-filter the payload attach; st13 replays
    // d17's probe per micro-batch and localCheckpoints its result past
    // the finally-swept index tables
    "d17_incremental_dedup", "st13_streaming_ingest_dedup",
    // m05/m06 materialize the decoded (id, dhash) table once (the ImageIO
    // pass would otherwise run on both sides of the banded self-join);
    // m06 additionally runs d09's min-label closure over the pair graph
    "m05_perceptual_dedup", "m06_perceptual_clusters",
    // m07 materializes the adversarial payload set once — BOTH decode
    // operators (extractFeatures, withDHash) consume it
    "m07_media_robustness",
    // t36's build tokenizes once into a checkpointed (doc, token, tf)
    // table that postings/df/stats all derive from (t16's discipline);
    // the residue exists only on the build invocation of a fresh fixture.
    // t37 shares the same versioned index — it only carries the residue
    // when IT is the invocation that triggers the build
    // st21's per-batch delta builds run the same checkpointed tokenize;
    // t38 shares t36's versioned index like t37 (residue only when it is
    // the invocation that triggers the build) — and t37 additionally
    // persists its matched-docs-sized shared scored frame (ONE cache
    // entry per (index, terms), deduped by CacheManager's canonical-plan
    // key — the round-18 advice #3 single-scan fix)
    "t36_bm25_retrieval", "t37_hybrid_rrf", "t38_batch_retrieval",
    "st21_streaming_bm25",
    // t39's buildPositional checkpoints its tokenize pass (postings AND
    // bigram stats derive from it) — residue only on the build invocation;
    // st22's per-batch positional delta builds run the same checkpoint
    "t39_phrase_search", "st22_streaming_phrase",
    // st23's per-batch closureMerge checkpoints the (merge-bounded) label
    // merges + its final labels outlive the finally-swept index tables;
    // st24 checkpoints each batch's decoded (id, dhash) table + its final
    // pair union; t40/t41 share the t36/t39 versioned indexes (residue
    // only when they trigger the build).
    // NOTE on the hybrid probe registry (round-19 verdict #6): t37's
    // cached scored frames live in Bm25Index.hybridScored — ONE entry per
    // live index name, reused across plan-identical probes, swapped on a
    // changed plan, and RELEASED when retention sweeps the index (every
    // sweep path publishes swept names through SweepHooks; Bm25Spec pins
    // sweep -> no live entry). Bounded by live index count by
    // construction — never by probe count.
    "st23_streaming_closure", "st24_streaming_perceptual",
    "t40_batch_hybrid", "t41_proximity_search")

  test("no CartesianProduct and no cache leaks anywhere in the declared surface") {
    val dir = "/root/testdata/sf0.01"
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = spark.sparkContext.getPersistentRDDs.keySet
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: unconditional CartesianProduct in the plan"
        val fresh = spark.sparkContext.getPersistentRDDs.view
          .filterKeys(k => !before.contains(k)).values.toSeq
        if (fresh.nonEmpty && !checkpointBacked(name))
          failures += s"$name: leaked ${fresh.size} persistent RDD(s) " +
            "(persist without unpersist, or an undeclared localCheckpoint)"
        // clean either way so one query's residue can't mask the next's
        fresh.foreach(_.unpersist(false))
      } catch { case e: Throwable =>
        failures += s"$name: construction failed: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, s"${failures.size} lint failure(s):\n${failures.mkString("\n")}")
  }
}
