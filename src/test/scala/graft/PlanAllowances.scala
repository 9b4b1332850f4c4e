package graft

/** The ONE canonical list of declared BroadcastNestedLoopJoin sites,
  * shared by PlanGuardSpec (logical-level guard) and PlanSweepSpec
  * (executed-plan sweep) — the two lists drifted twice (q_density_
  * sample round 11, q_bm25_incr/q_sim_topk_pq round 12), each time
  * green in one spec and red in the other. Per-query justifications
  * live beside the names; every entry is a broadcast of a ONE-row /
  * metadata-sized frame against one corpus scan, never a data×data
  * cartesian. */
object PlanAllowances {
  val bnljAllowed: Set[String] = Set(
    // probe batches / centroid tables broadcast against one corpus scan
    "q_sim_topk", "q_sim_topk_ivf", "q_sim_topk_ivf_trained",
    "q_cluster", "q_knn_clf", "q_knn_clf_ivf", "q_embed_outlier",
    "q_density_sample",
    // nano k-means: the per-iteration centroid table (≤ nCells rows)
    // broadcast for each unrolled E-step; the recall audit composes
    // q_sim_topk's probe broadcast with q_sim_topk_ivf's centroid one
    "q_kmeans", "q_ann_recall",
    // containment rides the ngram shingle lane and its one-row
    // frequent-set broadcast (shared shingleCandidates core)
    "q_dedup_containment",
    // nProbes-row ADC distance tables against the PQ code frame
    "q_sim_topk_pq",
    // the IVFADC composition adds the 16-row centroid broadcast for
    // the cell assignment; the code-frame join itself is cell-keyed
    "q_sim_topk_pq_ivf",
    // ONE-row aggregate scalars / arrays broadcast onto a scored frame
    "q_dedup_ngram", "q_tfidf", "q_profile_approx", "q_profile",
    "q_profile_incr", "q_line_dedup", "q_line_dedup_incr", "q_vocab",
    "q_bm25", "q_bm25_incr", "q_dsir", "q_pmi", "q_ngram_lm",
    // forget twins read through bm25FromIndex and its one-row
    // (N, avgdl) stats scalar broadcast
    "q_forget", "q_forget_purge",
    // the incremental LM shares q_ngram_lm's ONE-row vocab-size scalar
    // broadcast (LmIndex.scoreFromIndex → Scoring.lmScore)
    "q_ngram_lm_incr",
    // the LM forget read is the same scorer over the ledger-netted
    // model (same ONE-row vocab scalar broadcast)
    "q_lm_forget",
    // Kneser-Ney's ONE-row (N_bb, V) scalar pair broadcast (batch and
    // index-read forms share the scoring tail)
    "q_kneser_ney", "q_kneser_ney_incr",
    // rank agreement rides ngramLmQ and its one-row vocab-size scalar
    "q_rank_corr",
    // ccnet buckets ride ngramLmQ and its one-row vocab-size scalar
    "q_ccnet_buckets",
    // curriculumRanked's ONE-row tier-offset conditional sums (both
    // consumers), plus q_token_budget's ONE-row budget scalar
    "q_curriculum", "q_token_budget",
    // hybrid RRF: one-row probe vector, bm25's stats scalar, and the
    // three post-limit count scalars partitioning the rank windows
    "q_hybrid_rrf",
    // bitext mining: probe vectors and the ≤ k·|probes| candidate
    // vectors broadcast against one pool scan each
    "q_bitext_mine",
    // the IVF-blocked form adds the 16-row centroid table broadcast
    // for the cell assignment (the q_knn_clf_ivf precedent); the pool
    // joins themselves are cell-keyed broadcast HASH joins
    "q_bitext_mine_ivf",
    "q_corpus_clean",
    // the end-to-end DAG composes corpusClean (its one-row eval-shingle
    // broadcast) plus the BPE-train scalar broadcasts — same declared
    // shapes, one query
    "q_e2e_corpus",
    // the steady-state form keeps corpusClean's one-row eval-shingle
    // broadcast on the DELTA scan; the artifact lookups are equi-keyed
    // (bands/grams/vocab joins), no new BNLJ class
    "q_e2e_corpus_incr",
    // hard-negative mining is q_sim_topk's anchor-block broadcast with
    // the label-differs predicate riding the same join; the IVF form
    // adds the 16-row centroid broadcast for the cell assignment (the
    // q_knn_clf_ivf precedent — the candidate join itself is cell-keyed)
    "q_hard_negatives", "q_hard_negatives_ivf",
    // KMV overlap: |slices| k-bounded sketch rows theta-joined
    // (slice_a < slice_b) — metadata × metadata, never a corpus side;
    // the index-read form pairs the same merged sketch rows
    "q_source_overlap_kmv", "q_source_overlap_incr",
    // Heaps curve: the ONE-row max(doc_id) scalar broadcast onto the
    // token stream for the bucket arithmetic
    "q_heaps",
    // drift-vs-index: two ONE-row total scalars broadcast onto the
    // vocab-bounded full-outer token join
    "q_drift_incr",
    // KS: the |slices|-row size table broadcast against the count grid
    // (the <> fan-out that gives every pair the union of x values)
    "q_ks_test",
    // embedding decontamination: the eval-suite table (|corpus|/evalMod
    // rows — an eval suite, never corpus-sized) broadcast against one
    // corpus scan; the IVF form swaps it for the 16-row centroid
    // broadcast (the q_knn_clf_ivf precedent — the candidate join is
    // cell-keyed); the index-backed twin keeps the same centroid
    // broadcast over the eval probes
    "q_decontaminate_embed", "q_decontaminate_embed_ivf",
    "q_decontaminate_embed_incr")
}
