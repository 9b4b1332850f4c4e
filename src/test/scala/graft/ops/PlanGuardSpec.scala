package graft.ops

import graft.{SparkEntry, SparkSuite}

/** Plan guard-rails over EVERY declared query: physical-plan shapes that
  * must never regress, checked at planning time (no execution).
  *
  *  - No CartesianProduct anywhere: every join must ride a key or an
  *    explicit broadcast — an accidental cross product is the classic
  *    silent 100 TB killer.
  *  - BroadcastNestedLoopJoin only where DECLARED: the brute-force
  *    similarity scans intentionally broadcast a tiny probe set against
  *    the corpus (crossJoin(broadcast(probes))); anywhere else a BNLJ
  *    means a join lost its equi-condition.
  */
class PlanGuardSpec extends SparkSuite {

  // crossJoin(broadcast(tiny side)) by design: q_sim_topk broadcasts the
  // probe set; q_sim_topk_ivf (sampled or trained centroids) broadcasts
  // the centroid table (both O(k) rows against one corpus scan);
  // q_dedup_ngram broadcasts the ONE-row frequent-shingle array for the
  // map-side df-cap (Dedup.ngramJaccardPairs); q_tfidf broadcasts the
  // ONE-row corpus count onto the scored frame (TextOps.tfidfQ);
  // q_profile_approx cross-joins its four ONE-row aggregate subtrees
  // (Relational.profileApproxQ); q_line_dedup and its incremental form
  // broadcast the ONE-row boilerplate-span hash array for the in-row
  // filter (Dedup.applySpanFilter's gated fast path)
  private val bnljAllowed =
    // q_vocab broadcasts the ONE-row corpus token total onto the k
    // surviving vocabulary rows (TextOps.vocabQ); q_bm25 the ONE-row
    // (n_docs, avgdl) scalar; q_dsir the ONE-row smoothing totals onto
    // the ≤nBuckets count rows (Scoring)
    // q_pmi broadcasts the ONE-row (N, B) totals onto the vocab-bounded
    // bigram table (TextOps.pmiQ)
    // q_profile (and the gated q_profile_incr that embeds it as the
    // exact twin) cross-joins its ONE-row count/min/max and per-column
    // count_distinct subtrees (Relational.profileQ round-9 split form)
    // q_ngram_lm broadcasts the ONE-row train-vocab size V onto the
    // scored bigram stream (Scoring.ngramLmQ)
    // q_corpus_clean broadcasts the ONE-row eval-shingle array for the
    // in-row containment merge-intersect (Cleaning.corpusCleanQ)
    // q_knn_clf broadcasts the metadata-sized probe batch against one
    // labeled-corpus scan (SimSearch.knnClassify — same shape as
    // q_sim_topk's probe broadcast)
    Set("q_sim_topk", "q_sim_topk_ivf", "q_sim_topk_ivf_trained",
      "q_dedup_ngram", "q_tfidf", "q_cluster", "q_profile_approx",
      "q_profile", "q_profile_incr",
      "q_line_dedup", "q_line_dedup_incr", "q_vocab", "q_bm25", "q_dsir",
      "q_pmi", "q_ngram_lm", "q_corpus_clean", "q_knn_clf",
      // q_knn_clf_ivf, q_embed_outlier, and q_density_sample broadcast
      // the 16-row sampled centroid table against one corpus scan
      // (q_cluster's shape)
      "q_knn_clf_ivf", "q_embed_outlier", "q_density_sample",
      // q_bm25_incr cross-joins the ONE-row (N, avgdl) scalar onto the
      // bucket-pruned postings read (TextIndex.bm25FromIndex — the same
      // scalar-broadcast shape as q_bm25's batch form)
      "q_bm25_incr",
      // q_sim_topk_pq broadcasts the nProbes-row ADC distance tables
      // against one pass over the PQ code frame (q_sim_topk's shape)
      "q_sim_topk_pq")

  test("skew split join: hot path broadcasts by construction, cold path shuffles") {
    // isolated session (suites may run in parallel; see DedupVerifyModeSpec)
    // with auto-broadcast OFF: any BroadcastHashJoin left in the plan is
    // there because skewSplitJoin HINTED it — the guarantee that the hot
    // fact slice never shuffles cannot silently decay into a sort-merge
    // join once the dim outgrows the auto threshold
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val fact = ((0 until 5000).map(_ => ("hot", 1L)) ++
      (0 until 200).map(i => (s"k${i % 50}", 2L))).toDF("k", "v")
    val dim = ((0 until 50).map(i => (s"k$i", i)) :+ (("hot", -1))).toDF("k", "d")
    val plan = Skew.skewSplitJoin(fact, dim, "k", hotThreshold = 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "hot slice must ride hinted broadcasts:\n" + plan.take(800))
    // EXACTLY one shuffle join — the cold slice. The hot-side splits
    // and the hot dim join are all hinted broadcasts; a second
    // SortMergeJoin means one of those hints was lost and a hot slice
    // decayed to a shuffle (the regression this guard exists for — a
    // bare contains() check stays green through that decay because the
    // cold join supplies its SMJ and the semi-joins their BHJ).
    val smjCount = "SortMergeJoin".r.findAllIn(plan).size
    assert(smjCount == 1,
      s"expected exactly the cold-slice SortMergeJoin, found $smjCount:\n" + plan.take(800))
  }

  test("no declared query plans a cartesian product; BNLJ only where declared") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(500)}")
      if (!bnljAllowed(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an undeclared BroadcastNestedLoopJoin:\n${plan.take(500)}")
      }
    }
  }
}
