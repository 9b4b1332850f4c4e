package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{BloomJoin, Cleaning, Components, Dedup, EventAnalytics, EventWindows, Layout, MultiModal, ProfileIndex, Relational, Sampling, Scoring, SimSearch, Skew, TextOps}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + FIXTURES.md §3.
  *
  * Every entry in [[queries]] is one declared operator family from
  * SURVEY.md §2.4; every entry with a key in [[oracleSql]] is
  * differentially checked against DuckDB at sf0.01 (column names and
  * output types are aligned on both sides — integer outputs are BIGINT,
  * ratios DOUBLE — because the driver hash-compares values after sorting
  * columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Job-B replica, batch form: sliding-window counts + per-window top-3. */
  def entry(spark: SparkSession): DataFrame = {
    Engine.tune(spark)
    EventWindows.slideTopN(Tables.events(spark, "/root/testdata/sf0.001"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q_scan_project" -> ((s, d) => Relational.scanProject(s, d)),
    "q_filter" -> ((s, d) => Relational.filterQ(s, d)),
    "q_agg_group" -> ((s, d) => Relational.aggGroup(s, d)),
    // the same aggregate over the bucket-sorted lineitem catalog table —
    // the layout a deployment scans (many files → parallel map-phase
    // decimal partials; the raw fixture is one row group = one map
    // task). Answer identical by gate; first call pays the one-time
    // bucketed write like q_join_inner_bucketed.
    "q_agg_group_bucketed" -> ((s, d) => {
      graft.sources.Bucketing.ensureFactTables(s, d)
      Relational.aggGroupBucketed(s, d)
    }),
    "q_agg_distinct" -> ((s, d) => Relational.aggDistinct(s, d)),
    // sketch cardinality under the hash gate: the declared query emits
    // the exact twin + the ±3·rsd law as data (pure sketch form stays
    // the production path — Relational.aggApproxDistinct)
    "q_agg_approx_distinct" -> ((s, d) => Relational.aggApproxDistinctGated(s, d)),
    "q_rollup" -> ((s, d) => Relational.rollupQ(s, d)),
    "q_cube" -> ((s, d) => Relational.cubeQ(s, d)),
    "q_join_inner" -> ((s, d) => Relational.joinInner(s, d)),
    // the same semantics on bucket-sorted catalog tables — the plan the
    // 100 TB fact join actually runs (exchange-free SMJ on the fact
    // edge; BucketingSpec pins the no-Exchange shape). First call per
    // (session, dir) pays the one-time bucketed write, like every other
    // persisted-artifact query here.
    "q_join_inner_bucketed" -> ((s, d) => {
      graft.sources.Bucketing.ensureFactTables(s, d)
      Relational.joinInnerBucketed(s, d)
    }),
    "q_join_outer" -> ((s, d) => Relational.joinOuter(s, d)),
    "q_join_semi_anti" -> ((s, d) => Relational.joinSemiAnti(s, d)),
    "q_join_theta" -> ((s, d) => Relational.joinTheta(s, d)),
    "q_join_asof" -> ((s, d) => Relational.asofJoin(s, d)),
    // staleness-bounded as-of (pandas merge_asof tolerance): latest
    // order at-or-before AND within 365 days, else null
    "q_join_asof_tol" -> ((s, d) => Relational.asofJoinTolerance(s, d)),
    "q_join_range" -> ((s, d) => Relational.rangeJoinQ(s, d)),
    "q_setops" -> ((s, d) => Relational.setOps(s, d)),
    "q_pivot" -> ((s, d) => Relational.pivotQ(s, d)),
    "q_unpivot" -> ((s, d) => Relational.unpivotQ(s, d)),
    "q_sql" -> ((s, d) => Relational.sqlQ(s, d)),
    "q_subquery" -> ((s, d) => Relational.subqueryQ(s, d)),
    // LIMIT-ed LATERAL subquery, decorrelated by Catalyst into a rank
    // window with WindowGroupLimit pushdown (k rows per key leave each
    // map task — the scale-right per-key top-k plan)
    "q_lateral" -> ((s, d) => Relational.lateralQ(s, d)),
    // WITH RECURSIVE fixpoint (Spark 4 UnionLoop): hierarchy walk whose
    // iteration count is the tree DEPTH, each level one distributed join
    "q_recursive_cte" -> ((s, d) => Relational.recursiveCteQ(s, d)),
    "q_window_rank" -> ((s, d) => Relational.windowRank(s, d)),
    "q_window_analytic" -> ((s, d) => Relational.windowAnalytic(s, d)),
    // value-RANGE frame (rolling 30-day spend) — peer-inclusive, so
    // deterministic under same-day order ties where ROWS would not be
    "q_window_range" -> ((s, d) => Relational.windowRange(s, d)),
    // ORC round-trip: lineitem converted once, read back through the ORC
    // scanner with pushdown + pruning (FormatsSpec pins the plan facts)
    "q_source_orc" -> ((s, d) => graft.sources.Formats.orcScanAggQ(s, d)),
    // text-format seams: typed write → schema-on-read, value-exact vs
    // the parquet oracle (CSV for tabular lanes, JSONL for free text)
    "q_source_csv" -> ((s, d) => graft.sources.Formats.csvScanAggQ(s, d)),
    "q_source_jsonl" -> ((s, d) => graft.sources.Formats.jsonlStatsQ(s, d)),
    "q_profile" -> ((s, d) => Relational.profileQ(s, d)),
    // the sketch form a 100 TB corpus profiles with FIRST, under the
    // hash gate: exact lanes + the HLL ±3·rsd law emitted as data
    // against the exact melt (pure sketch form stays the production
    // path — Relational.profileApproxQ)
    "q_profile_approx" -> ((s, d) => Relational.profileApproxGated(s, d)),
    "q_stats_agg" -> ((s, d) => Relational.statsAggQ(s, d)),
    "q_sort_limit" -> ((s, d) => Relational.sortLimit(s, d)),
    "q_scalar" -> ((s, d) => Relational.scalarQ(s, d)),
    "q_json" -> ((s, d) => Relational.jsonQ(s, d)),
    "q_map" -> ((s, d) => Relational.mapQ(s, d)),
    "q_array" -> ((s, d) => Relational.arrayQ(s, d)),
    "q_quantile" -> ((s, d) => Relational.quantileQ(s, d)),
    // winsorized per-group stats: clip at the group's exact 6-dp
    // [p05, p95], clipped sums exact in DECIMAL
    "q_winsorize" -> ((s, d) => Relational.winsorizeQ(s, d)),
    // the GK sketch's own rank contract under the hash gate (pure
    // sketch form stays the production path — Relational.quantileApproxQ)
    "q_quantile_approx" -> ((s, d) => Relational.quantileApproxGated(s, d)),
    "q_grouping_sets" -> ((s, d) => Relational.groupingSetsQ(s, d)),
    "q_date" -> ((s, d) => Relational.dateQ(s, d)),
    // reference-job replicas (batch form; streaming forms in graft.streaming)
    "q_win_tumble" -> ((s, d) => EventWindows.tumbleCounts(Tables.events(s, d))),
    "q_win_slide_topn" -> ((s, d) => EventWindows.slideTopN(Tables.events(s, d))),
    "q_win_session" -> ((s, d) => EventWindows.sessionCounts(Tables.events(s, d))),
    // LLM-pipeline operators (DataFrame-first: any (doc_id, text) /
    // (vec_id, embedding) frame works — the test tables are one wiring)
    "q_dedup" -> ((s, d) => Dedup.exactDedup(Tables.documents(s, d))),
    "q_dedup_near" -> ((s, d) => Dedup.nearDupPairs(Tables.documents(s, d))),
    // the minhash estimator itself, gated: signature-agreement estimate
    // vs exact jaccard per verified pair, absolute error as data
    "q_minhash_est" -> ((s, d) => Dedup.minhashEstQ(Tables.documents(s, d))),
    "q_dedup_incr" -> ((s, d) => Dedup.incrementalNearDupQ(s, d)),
    // right-to-be-forgotten on the LSH store: indexed doc_id % 13 = 0
    // tombstoned, the delta lookup can never pair against them
    "q_dedup_forget" -> ((s, d) => Dedup.forgetNearDupQ(s, d)),
    "q_dedup_fuzzy_incr" -> ((s, d) => Dedup.incrementalFuzzyQ(s, d)),
    "q_dup_clusters" -> ((s, d) => Components.dupClustersQ(s, d)),
    // incremental cluster maintenance: standing corpus labels + delta
    // pairs folded in via mergeClusters, hash-gated against batch
    // re-clustering of the union (LSH pairs decompose exactly by side)
    "q_dup_clusters_incr" -> ((s, d) => Components.dupClustersIncrQ(s, d)),
    // quality-aware canonical selection: keep the longest member of each
    // near-dup cluster (C4/RefinedWeb keep-rule), rank window per cluster
    "q_dedup_best" -> ((s, d) => Components.dedupBestQ(s, d)),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d))),
    // ExactSubstr (Lee et al.) at 8-token-gram coverage granularity:
    // remove every token inside a >= 8-token run occurring twice anywhere
    "q_substring_dedup" -> ((s, d) => Dedup.substringDedup(Tables.documents(s, d))),
    // delta excised against the persisted gram-frequency index (the
    // sixth index): totals = index counts + the delta's own counts
    "q_substring_dedup_incr" -> ((s, d) => Dedup.incrementalSubstringQ(s, d)),
    // right-to-be-forgotten on the gram-count index: victims' grams
    // leave the duplicate table via the negative-count ledger
    "q_substring_forget" -> ((s, d) => Dedup.substringForgetQ(s, d)),
    "q_dedup_ngram" -> ((s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d))),
    // asymmetric containment (|∩|/min) over the same shingle lane —
    // catches a document pasted inside a longer one, which Jaccard dilutes
    "q_dedup_containment" -> ((s, d) => Dedup.containmentPairs(Tables.documents(s, d))),
    "q_fingerprint" -> ((s, d) => Dedup.fingerprints(Tables.documents(s, d))),
    "q_multimodal" -> ((s, d) => MultiModal.payloadFeatures(Tables.documents(s, d))),
    // perceptual (dHash) near-dup over payloads + re-encoded variants:
    // 60-bit gradient hash, 4x15-bit LSH bands, hamming <= 3 exact
    "q_image_dedup" -> ((s, d) => MultiModal.imageDedupQ(Tables.documents(s, d))),
    // incoming re-encodes deduped against the persisted dHash band
    // index (the seventh index): bucket-pruned read, inline hamming
    "q_image_dedup_incr" -> ((s, d) => MultiModal.imageDedupIncrQ(s, d)),
    // frame-fingerprint video near-dup: fixed-stride frames, per-frame
    // dHash60, pairs sharing >= 3 distinct frame fingerprints
    "q_video_dedup" -> ((s, d) => MultiModal.videoFrameDedupQ(Tables.documents(s, d))),
    // chromaprint-style audio near-dup: native per-window band-energy
    // difference fingerprints (ChromaFp), >= 3 shared distinct windows
    // under a df cap — the video pairing shape on the audio decode stub
    "q_audio_dedup" -> ((s, d) => MultiModal.audioFingerprintDedupQ(Tables.documents(s, d))),
    // the FIFTEENTH persisted index: bucketed chroma fingerprints,
    // corpus indexed once + variant delta probed through the pruned read
    "q_audio_dedup_incr" -> ((s, d) => MultiModal.audioDedupIncrQ(s, d)),
    "q_text_stats" -> ((s, d) => TextOps.textStats(Tables.documents(s, d))),
    // per-source data card: volume, language spread, token budget,
    // corpus-wide exact-dup counts — two-exchange budget, hash-key shuffle
    "q_corpus_report" -> ((s, d) => TextOps.corpusReportQ(Tables.documents(s, d))),
    // the EIGHTH persisted index: additive data-card stats + content-
    // hash frequency, corpus indexed once + delta appended, report-on-read
    "q_corpus_report_incr" -> ((s, d) => graft.ops.ReportIndex.incrementalReportQ(s, d)),
    "q_corpus_report_forget" -> ((s, d) => graft.ops.ReportIndex.reportForgetQ(s, d)),
    // the ELEVENTH persisted index: additive (count, min, max) bucket
    // histogram over the lineitem numeric lanes, quantile ENCLOSURE
    // read from the folded partials (portable floor(v/16) bucketing)
    "q_quantile_incr" -> ((s, d) => graft.ops.QuantileIndex.quantileIncrQ(s, d)),
    // count-min sketch: metadata-sized (4×1024) additive counter grid
    // derived from the vocab-bounded term-count table; the query emits
    // the sketch's one-sided error law as data (n_est >= n_exact)
    "q_cms_topk" -> ((s, d) => graft.ops.CmsIndex.cmsTopKQ(Tables.documents(s, d))),
    // the TENTH persisted index: additive CMS counters, corpus indexed
    // once + delta appended, estimates read from the folded partials
    "q_cms_incr" -> ((s, d) => graft.ops.CmsIndex.cmsIncrQ(s, d)),
    // distributed BPE tokenizer training: vocab-bounded pair-count
    // aggregate per round + one-row argmax collect, map-side greedy merge
    "q_bpe_merges" -> ((s, d) => graft.ops.Bpe.bpeMergesQ(s, d)),
    // the apply side: vocab segmented under the learned merges (train
    // once + one map-side fold stack, no extra shuffle)
    "q_bpe_encode" -> ((s, d) => graft.ops.Bpe.bpeEncodeQ(s, d)),
    // tokenizer-eval readout: per-source fertility + compression
    "q_tokenizer_fertility" -> ((s, d) => graft.ops.Bpe.tokenizerFertilityQ(s, d)),
    // SentencePiece-style unigram tokenizer: seeded substring vocab,
    // two Viterbi-E-step + prune rounds (integer-exact objective), the
    // pruned (piece, utility) model as the output
    "q_unigram_train" -> ((s, d) => graft.ops.Unigram.unigramTrainQ(s, d)),
    // the apply side: vocab words segmented under the pruned pieces
    "q_unigram_encode" -> ((s, d) => graft.ops.Unigram.unigramEncodeQ(s, d)),
    // the steady-state form: model trained + persisted once, the
    // corpus encoded off the frozen (piece, utility) table — no
    // training-corpus access on the encode path
    "q_unigram_encode_incr" -> ((s, d) => graft.ops.Unigram.unigramEncodeIncrQ(s, d)),
    // end-to-end export: train BPE -> encode corpus -> pack encoded
    // stream into 512-token sequences (per-shard summary)
    "q_tokenize_pack" -> ((s, d) => graft.ops.Bpe.tokenizePackQ(s, d)),
    "q_text_quality" -> ((s, d) => TextOps.qualityScores(Tables.documents(s, d))),
    // consecutive-duplicate-token collapse (OCR/ASR stutter cleanup) —
    // a pure map-side transform, zero shuffles at any corpus size
    "q_collapse_repeats" -> ((s, d) => TextOps.collapseRepeatsQ(Tables.documents(s, d))),
    // the Gopher doc-level rule battery, all-integer thresholds
    "q_gopher_rules" -> ((s, d) => TextOps.gopherRulesQ(Tables.documents(s, d))),
    "q_repetition" -> ((s, d) => TextOps.repetitionScores(Tables.documents(s, d))),
    "q_lang_id" -> ((s, d) => TextOps.langId(Tables.documents(s, d))),
    "q_top_tokens" -> ((s, d) => TextOps.topTokens(Tables.documents(s, d))),
    "q_tfidf" -> ((s, d) => TextOps.tfidfQ(Tables.documents(s, d))),
    "q_ngram_counts" -> ((s, d) => TextOps.ngramCountsQ(Tables.documents(s, d))),
    "q_redact" -> ((s, d) => TextOps.redactQ(Tables.documents(s, d))),
    // typed entity inventory: one-scan multi-pattern extraction, the
    // (kind, entity) -> (n_docs, n_occurrences) governance readout
    "q_entities" -> ((s, d) => TextOps.entitiesQ(Tables.documents(s, d))),
    // the SIXTEENTH persisted index: inventory folded from per-doc
    // entity rows over a build + append split
    "q_entities_incr" -> ((s, d) => graft.ops.EntityIndex.entitiesIncrQ(s, d)),
    // the delete-request discovery read: one identifier, one pruned
    // bucket, every holding doc
    "q_entity_forget" -> ((s, d) => graft.ops.EntityIndex.entityForgetQ(s, d)),
    "q_entity_lookup" -> ((s, d) => graft.ops.EntityIndex.entityLookupQ(s, d)),
    // C4-style heuristic line-filter battery over a deterministic
    // synthesized line structure (the redactQ precedent) — per-doc
    // verdicts + cleaned text, all map-side
    "q_c4_filters" -> ((s, d) => TextOps.c4FiltersQ(Tables.documents(s, d))),
    // HTML/boilerplate extraction over deterministic synthesized page
    // chrome — the stage ahead of every other cleaning operator
    "q_html_extract" -> ((s, d) =>
      graft.ops.Cleaning.htmlExtractQ(Tables.documents(s, d))),
    "q_bloom_join" -> ((s, d) => BloomJoin.bloomJoinQ(s, d)),
    "q_skew_agg" -> ((s, d) => Skew.skewAggQ(s, d)),
    "q_skew_join" -> ((s, d) => Skew.skewJoinQ(s, d)),
    "q_split" -> ((s, d) => Sampling.splitQ(Tables.documents(s, d))),
    // eval-contamination audit: near-dup pairs straddling splits under
    // the naive hash split vs the leak-free cluster split
    "q_split_leak_audit" -> ((s, d) => Sampling.splitLeakAuditQ(Tables.documents(s, d))),
    "q_sample" -> ((s, d) => Sampling.sampleQ(Tables.documents(s, d))),
    "q_mixture" -> ((s, d) => Sampling.mixtureQ(Tables.documents(s, d))),
    "q_sample_stratified" -> ((s, d) => Sampling.stratifiedQ(Tables.documents(s, d))),
    "q_shard" -> ((s, d) => Sampling.shardQ(Tables.documents(s, d))),
    "q_pack" -> ((s, d) => Sampling.packQ(Tables.documents(s, d))),
    // quality-tier-major curriculum order: per-doc global position via
    // the pack-style (tier, sub) slice prefix sums — no global sort
    "q_curriculum" -> ((s, d) => Sampling.curriculumQ(Tables.documents(s, d))),
    // greedy selection under a 60%-of-corpus token budget in
    // curriculum order (per-tier summary)
    "q_token_budget" -> ((s, d) => Sampling.tokenBudgetQ(Tables.documents(s, d))),
    "q_dedup_fuzzy" -> ((s, d) => Dedup.fuzzyMatchQ(Tables.documents(s, d))),
    "q_decontaminate" -> ((s, d) => Dedup.contaminationQ(Tables.documents(s, d))),
    // the same decontamination with a bloom prefilter on the corpus
    // shingle stream — shares q_decontaminate's oracle (bloom invisible)
    "q_decontaminate_bloom" -> ((s, d) => Dedup.contaminationBloomQ(Tables.documents(s, d))),
    "q_sim_topk" -> ((s, d) => SimSearch.cosineTopK(Tables.embeddings(s, d))),
    // contrastive-training pair mining: top-k nearest neighbors with a
    // DIFFERENT label per anchor (similar-looking, semantically wrong)
    "q_hard_negatives" -> ((s, d) => SimSearch.hardNegativesQ(Tables.embeddings(s, d))),
    // the IVF-blocked 100 TB form: anchors only score their own
    // centroid cell (blocking as declared semantics, fully hash-gated)
    "q_hard_negatives_ivf" -> ((s, d) => SimSearch.hardNegativesIvfQ(Tables.embeddings(s, d))),
    // recall@k of the IVF search against the exact ground truth — the
    // serving-side index acceptance audit, exact set arithmetic
    "q_ann_recall" -> ((s, d) => SimSearch.annRecallQ(Tables.embeddings(s, d))),
    // product-quantization ANN (ADC, inner-product metric): corpus
    // encoded once as M=4 one-byte codes via a 32-row codebook
    // broadcast; probes score candidates off their precomputed nano
    // distance tables — integer sums, bit-replayable
    "q_sim_topk_pq" -> ((s, d) => SimSearch.pqTopKQ(s, d)),
    // FAISS's IVFADC composition: cell pruning picks WHICH codes are
    // read (sampled-centroid argmax, oracle-recomputed), PQ's ADC
    // scores them — identical integer arithmetic to the full scan
    "q_sim_topk_pq_ivf" -> ((s, d) => SimSearch.pqIvfTopKQ(s, d)),
    // hybrid retrieval: BM25 top-k + cosine top-k fused by RRF (k=60)
    "q_hybrid_rrf" -> ((s, d) => SimSearch.hybridRrfQ(s, d)),
    // margin-based bitext mining (exact integer-nano margins)
    "q_bitext_mine" -> ((s, d) => SimSearch.bitextMineQ(Tables.embeddings(s, d))),
    // the 100 TB form: both pools cell-blocked on sampled centroids
    // (declared semantics the oracle recomputes), candidates and
    // reverse neighborhoods restricted to the probe's/candidate's cell
    "q_bitext_mine_ivf" -> ((s, d) => SimSearch.bitextMineIvfQ(Tables.embeddings(s, d))),
    // MMR diversity re-ranking: greedy 7*rel - 3*maxsim in exact nanos
    "q_mmr" -> ((s, d) => SimSearch.mmrQ(Tables.embeddings(s, d))),
    // the batch form a RAG stack runs: per-probe greedy over a grouped
    // bounded-buffer relevance cut (one corpus scan for ALL probes)
    "q_mmr_batch" -> ((s, d) => SimSearch.mmrBatchQ(Tables.embeddings(s, d))),
    // DPO preference-pair assembly: quality-ranked chosen/rejected
    "q_pref_pairs" -> ((s, d) => graft.ops.SftOps.prefPairsQ(Tables.documents(s, d))),
    // chat-transcript flattening: serialize -> from_json -> (prompt,
    // response) SFT pairs, losslessness gated by the token oracle
    "q_chat_turns" -> ((s, d) => graft.ops.SftOps.chatTurnsQ(Tables.documents(s, d))),
    // sign-bucket blocking is DECLARED semantics (both engines compute
    // identical buckets — same construction q_embed_neardup gates), so
    // the LSH top-k is deterministic and fully hash-checked
    "q_sim_topk_lsh" -> ((s, d) => SimSearch.signBucketTopK(Tables.embeddings(s, d))),
    // kNN majority-vote label propagation: probe batch broadcast, top-k
    // on the bounded-buffer aggregate (k rows/probe/map-task shuffle)
    "q_knn_clf" -> ((s, d) => SimSearch.knnClassifyQ(s, d)),
    // the cell-pruned form: IVF blocking as declared semantics (oracle
    // recomputes the identical cells), per-cell candidate volume
    "q_knn_clf_ivf" -> ((s, d) => SimSearch.knnClassifyIvfQ(s, d)),
    // IVF with deterministic sampled centroids: assignment (gated alone
    // by q_cluster), probe-cell ranking, and cell-pruned top-k are all
    // pure functions of the data → fully hash-checked oracle
    "q_sim_topk_ivf" -> ((s, d) => SimSearch.ivfTopK(Tables.embeddings(s, d))),
    // the k-means-trained centroid path, driver-checked every round:
    // train -> persisted inverted file -> partition-pruned probe (build
    // memoized per session+dir; see SimSearch.trainedIvfQ). Distributed
    // double means are order-dependent in the last ulp, so the probe
    // rows can't hash-match — the declared query instead emits the
    // recall law vs the in-query brute-force top-k as data (oracle
    // replays the brute-force counts + literal TRUE)
    "q_sim_topk_ivf_trained" -> ((s, d) => SimSearch.trainedIvfGatedQ(s, d)),
    // the assignment math (broadcast centroids, map-side argmax,
    // sim-then-lowest-cell tie-break) under the hash gate in isolation
    // — the building block the IVF oracles above compose
    "q_cluster" -> ((s, d) => SimSearch.clusterProfileQ(s, d)),
    // spherical k-means, BOTH steps gated: q_cluster's argmax E-step +
    // an integer-nano M-step (exact sums, one rounded division per
    // (cell, dim)) unrolled for 2 iterations
    "q_kmeans" -> ((s, d) => SimSearch.kmeansNanoQ(Tables.embeddings(s, d))),
    // per-cluster outlier flags in exact integer-nano arithmetic (the
    // SemDeDup prune step; no distributed double mean anywhere)
    "q_embed_outlier" -> ((s, d) => SimSearch.embedOutlierQ(s, d)),
    // inverse-cluster-density selection (D4/SSL-prototypes shape):
    // dense cells downsampled to ~target rows, sparse cells kept whole;
    // q_cluster's assignment + exact counts + the portable hash draw
    "q_density_sample" -> ((s, d) => SimSearch.densitySampleQ(s, d)),
    "q_embed_neardup" -> ((s, d) => SimSearch.embedNearDup(Tables.embeddings(s, d))),
    // embedding-space eval-set decontamination — the semantic
    // complement of the 13-gram q_decontaminate (catches paraphrased
    // leakage that shares no shingle): broadcast eval suite, one corpus
    // scan, map-side max_by argmax so the exchange carries |corpus| rows
    "q_decontaminate_embed" ->
      ((s, d) => SimSearch.deconEmbedQ(Tables.embeddings(s, d))),
    // the 100 TB form: IVF cell blocking (declared semantics — the
    // oracle recomputes the identical cells); probes read
    // nProbeCells/nCells of the cell-partitioned inverted file
    "q_decontaminate_embed_ivf" ->
      ((s, d) => SimSearch.deconEmbedIvfQ(Tables.embeddings(s, d))),
    // the steady-state twin: corpus cells read off the PERSISTED
    // cell-partitioned IVF index (partition-pruned to the probed
    // cells), eval suite as probes — bit-identical to the in-memory
    // form, so it shares that oracle text verbatim
    "q_decontaminate_embed_incr" ->
      ((s, d) => SimSearch.deconEmbedIncrQ(s, d)),
    "q_embed_quant" -> ((s, d) => SimSearch.quantizeQ(Tables.embeddings(s, d))),
    // sparse random projection (Achlioptas JL, 64→16): coordinate-hash
    // matrix regenerated by any engine, driver-materialized into
    // straight-line codegen adds — no per-row md5, no shuffle
    "q_embed_rp" -> ((s, d) => SimSearch.randomProjectQ(Tables.embeddings(s, d))),
    // dominant principal direction by 3 power-iteration rounds on the
    // integer micro grid — two corpus folds per round, d rows shipped
    "q_power_iter" -> ((s, d) => SimSearch.powerIterQ(Tables.embeddings(s, d))),
    // the scale form (corpus-sized bucket width + 2 sign projections):
    // autoBits and both rotation windows are pure functions of the
    // data, so the oracle recomputes the identical blocking from the
    // corpus count → fully hash-checked; recall properties additionally
    // pinned in LlmOpsSpec/PropertySpec
    "q_embed_neardup_auto" -> ((s, d) => SimSearch.embedNearDupAuto(Tables.embeddings(s, d))),
    // SemDeDup-style semantic dedup closed end-to-end: embedding
    // near-dup pairs -> connected components -> representative filter,
    // every keep/drop decision and cluster size under the hash gate
    "q_semantic_dedup" -> ((s, d) => Components.semanticDedupQ(s, d)),
    // CDC upsert compaction: one max_by hash aggregate, map-side
    // partials keep the per-key winner (no per-version window sort)
    "q_upsert" -> ((s, d) => Relational.upsertQ(Tables.events(s, d))),
    // fixed-bound equi-width histogram: single-pass, append-mergeable
    "q_hist" -> ((s, d) => Relational.histQ(Tables.events(s, d))),
    // SCD2 validity intervals: one per-key window over (ts, event_id)
    "q_scd2" -> ((s, d) => Relational.scd2Q(Tables.events(s, d))),
    // content-hash CDC between two crawl snapshots (B synthesized
    // deterministically from the fixture, mirrored in the oracle)
    "q_snapshot_diff" -> ((s, d) => Relational.snapshotDiffQ(s, d)),
    // per-group z-score flags: stats aggregate + broadcast join back,
    // never a per-row window buffer
    "q_anomaly" -> ((s, d) => Relational.anomalyQ(Tables.events(s, d))),
    // Z-order layout: morton interleave + per-bucket (user, value)
    // envelopes — the file-stats picture a zordered write would prune by
    "q_zorder" -> ((s, d) => Layout.zorderStatsQ(Tables.events(s, d))),
    // C4/CCNet-style span-level boilerplate removal with in-row
    // reassembly (span text never shuffles)
    "q_line_dedup" -> ((s, d) => Dedup.spanDedupQ(Tables.documents(s, d))),
    // the incremental form: delta cleaned against the persisted
    // bucket-partitioned span-frequency index of the 95% corpus
    "q_line_dedup_incr" -> ((s, d) => Dedup.incrementalSpanDedupQ(s, d)),
    // the composed cleaning pipeline: first-failing-stage attribution
    // over lang -> quality -> repetition -> dedup -> decontamination
    "q_corpus_clean" -> ((s, d) => Cleaning.corpusCleanQ(s, d)),
    // the WHOLE pipeline as one DAG: clean -> dedup (exact + near) ->
    // decontaminate -> substring-excise -> BPE-encode -> pack -> shard,
    // drop rows first-fail attributed, keep set as the shard manifest
    "q_e2e_corpus" -> ((s, d) => Cleaning.e2eCorpusQ(s, d)),
    "q_e2e_corpus_incr" -> ((s, d) => Cleaning.e2eCorpusIncrQ(s, d)),
    // tombstone-debt observability across the persisted indexes: pure
    // driver-side metadata (footer row counts + null stats), zero Spark
    // jobs. No oracleSql on purpose — the readout is engine-internal
    // state (artifact files, timestamps); exact debt laws are pinned in
    // ForgetAuditSpec, the driver records the rows-only check.
    "q_forget_audit" -> ((s, d) => graft.ops.ForgetAudit.forgetAuditQ(s, d)),
    // event-log analytics: the ordered per-user family the reference's
    // windowed counts generalize to — each pays the user_id exchange once
    "q_sessionize" -> ((s, d) => EventAnalytics.sessionize(Tables.events(s, d))),
    "q_funnel" -> ((s, d) => EventAnalytics.funnel(Tables.events(s, d))),
    "q_retention" -> ((s, d) => EventAnalytics.retention(Tables.events(s, d))),
    // weighted PageRank over the per-user page-transition graph: edge
    // list aggregated once, 5 damped iterations in integer nano-rank
    // arithmetic (bit-replayable — no distributed double sums)
    "q_pagerank" -> ((s, d) => EventAnalytics.pageRankQ(Tables.events(s, d))),
    // synchronous label-propagation communities over the symmetrized
    // transition graph: 2 fixed rounds, max-weight label, min-label
    // tie-break — (community, size) histogram
    "q_label_prop" -> ((s, d) => EventAnalytics.labelPropQ(Tables.events(s, d))),
    // HITS hubs/authorities: 3 mutual-reinforcement rounds on the nano
    // grid with max-norm renorm, top-20 by authority
    "q_hits" -> ((s, d) => EventAnalytics.hitsQ(Tables.events(s, d))),
    // rolling 30-day distinct users per active day: bounded-replication
    // explode, equi-keyed distinct count - the sliding-DISTINCT shape
    "q_mau" -> ((s, d) => EventAnalytics.mauQ(Tables.events(s, d))),
    // the HLL scale branch: per-day sketches replicate through the
    // window, exact twin in-query, error law emitted as data
    "q_mau_approx" -> ((s, d) => EventAnalytics.mauApproxQ(Tables.events(s, d))),
    // next-event training pairs: trailing-k context window per user,
    // one exchange, empty-context rows dropped
    "q_seq_dataset" -> ((s, d) => EventAnalytics.seqDatasetQ(Tables.events(s, d))),
    // HITS and LPA read from the SAME persisted edge store
    // q_pagerank_incr builds - one edge list, three link analyses
    "q_hits_incr" -> ((s, d) => graft.ops.EdgeIndex.hitsIncrQ(s, d)),
    "q_label_prop_incr" -> ((s, d) => graft.ops.EdgeIndex.labelPropIncrQ(s, d)),
    // the TWELFTH persisted index: additive transition-edge partials
    // (user-complete batches), ranks recomputed on read from the fold
    "q_pagerank_incr" -> ((s, d) => graft.ops.EdgeIndex.pageRankIncrQ(s, d)),
    // GDPR user-forget on the edge store: ranks as if the forgotten
    // users never browsed, served from the netted edge fold
    "q_pagerank_forget" -> ((s, d) => graft.ops.EdgeIndex.pageRankForgetQ(s, d)),
    // tokenizer-design readout: top-k vocabulary + cumulative coverage
    "q_vocab" -> ((s, d) => TextOps.vocabQ(Tables.documents(s, d))),
    // L2 normalization: the map-side preprocessing of every cosine pipeline
    "q_embed_norm" -> ((s, d) => SimSearch.embedNormQ(Tables.embeddings(s, d))),
    // persisted mergeable HLL profile index under the hash gate: the
    // sketch-side exact lanes + the HLL error law emitted as data
    // against the exact melt; append invariance stays in ProfileIndexSpec
    "q_profile_incr" -> ((s, d) => ProfileIndex.profileIncrGated(s, d)),
    // retrieval + data-selection scoring
    "q_bm25" -> ((s, d) => Scoring.bm25Q(Tables.documents(s, d))),
    // the NINTH persisted index: inverted postings (dl denormalized,
    // token-hash bucketed) + additive (N, total_dl) partials; retrieval
    // reads ONLY the query terms' buckets and must equal batch BM25
    "q_bm25_incr" -> ((s, d) => graft.ops.TextIndex.incrementalBm25Q(s, d)),
    // right-to-be-forgotten: doc_id ≡ 0 (mod 17) tombstoned at request
    // time, BM25 served through the tombstone anti-join
    "q_forget" -> ((s, d) => graft.ops.TextIndex.forgetQ(s, d)),
    // same request, physically purged at compaction (tombstones
    // cleared) — the reader must not be able to tell
    "q_forget_purge" -> ((s, d) => graft.ops.TextIndex.forgetPurgeQ(s, d)),
    // boolean retrieval (data AND query AND NOT fast) from the same
    // per-dir inverted index, bucket-pruned + anti-join exclusion
    "q_bool_search" -> ((s, d) => graft.ops.TextIndex.boolSearchQ(s, d)),
    // exact phrase search: positional postings + slot-adjacency match
    "q_phrase_search" -> ((s, d) => graft.ops.PhraseIndex.phraseSearchQ(Tables.documents(s, d))),
    // the FOURTEENTH persisted index: positional inverted index, corpus
    // indexed once + delta appended, phrases served bucket-pruned
    "q_phrase_search_incr" -> ((s, d) => graft.ops.PhraseIndex.phraseIncrQ(s, d)),
    // right-to-be-forgotten on the positional index: tombstone read
    // must equal the batch phrase search over the surviving corpus
    "q_phrase_forget" -> ((s, d) => graft.ops.PhraseIndex.phraseForgetQ(s, d)),
    "q_dsir" -> ((s, d) => Scoring.dsirQ(s, Tables.documents(s, d))),
    // RAG-style sliding-window chunking: map-side, one Generate
    "q_chunk" -> ((s, d) => TextOps.chunkQ(Tables.documents(s, d))),
    // URL canonicalization + exact dedup (the CommonCrawl-first step)
    "q_dedup_url" -> ((s, d) => Dedup.urlDedupQ(Tables.documents(s, d))),
    // per-user daily gap-filled series (per-user spine, co-partitioned fill)
    "q_resample" -> ((s, d) => EventAnalytics.resampleDaily(Tables.events(s, d))),
    // per-source token entropy: corpus-audit diversity readout
    "q_entropy" -> ((s, d) => TextOps.entropyQ(Tables.documents(s, d))),
    // cross-slice vocabulary overlap (jaccard of token sets per source pair)
    "q_source_overlap" -> ((s, d) => TextOps.sourceOverlapQ(Tables.documents(s, d))),
    // the 100 TB branch of q_source_overlap: KMV bottom-k sketches per
    // slice (map-side-combine bounded aggregate), union/jaccard/
    // intersection estimated from the sketches alone — deterministic
    // md5 hashes, so the estimates hash-gate exactly
    "q_source_overlap_kmv" -> ((s, d) => TextOps.kmvOverlapQ(Tables.documents(s, d))),
    // the SEVENTEENTH persisted index: per-slice bottom-k sketches,
    // overlap read from the store (merge law: bottom-k of a union ==
    // k smallest of the shards' bottom-k union)
    "q_source_overlap_incr" -> ((s, d) => graft.ops.KmvIndex.sourceOverlapIncrQ(s, d)),
    // Jensen–Shannon divergence between per-source unigram
    // distributions — the distribution-shift audit data-mixing keys on
    "q_source_drift" -> ((s, d) => TextOps.sourceDriftQ(Tables.documents(s, d))),
    // Zipf rank-frequency OLS fit per source (slope ≈ −1 for natural text)
    // GATE at 5 dp on the regr_* columns (round-15 verdict #7): the
    // operator keeps its 6-dp contract; the declared query re-rounds so
    // a value landing on a 6-dp rounding boundary cannot flip the gate
    // hash across partitionings (the documented fallback, now live)
    "q_zipf" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, round}
      TextOps.zipfQ(Tables.documents(s, d))
        .withColumn("zipf_slope", round(col("zipf_slope"), 5))
        .withColumn("zipf_intercept", round(col("zipf_intercept"), 5))
        .withColumn("zipf_r2", round(col("zipf_r2"), 5))
    }),
    // Heaps vocabulary-growth curve at 100 doc_id-range checkpoints
    "q_heaps" -> ((s, d) => TextOps.heapsQ(Tables.documents(s, d))),
    // Flesch reading-ease per doc, banded on the rounded score
    "q_readability" -> ((s, d) => TextOps.readabilityQ(Tables.documents(s, d))),
    // collocations: top-k bigrams by PMI with a min-count guard
    "q_pmi" -> ((s, d) => TextOps.pmiQ(Tables.documents(s, d))),
    // two-proportion z-test between deterministic user variants
    "q_abtest" -> ((s, d) => EventAnalytics.abTest(Tables.events(s, d))),
    // interval × interval overlap join, double-sided binning (no equi key)
    "q_join_interval" -> ((s, d) => Relational.intervalJoinQ(s, d)),
    // full winnowing (MOSS) fingerprints → substring-dup candidate pairs
    "q_winnow" -> ((s, d) => Dedup.winnowPairs(Tables.documents(s, d))),
    // delta vs persisted winnow-fingerprint index (the fifth index's
    // pruned-read lookup; build memoized per session+dir)
    "q_winnow_incr" -> ((s, d) => Dedup.incrementalWinnowQ(s, d)),
    // right-to-be-forgotten on the winnow index: forgotten corpus docs
    // neither pair with the delta nor count toward the df cap
    "q_winnow_forget" -> ((s, d) => Dedup.winnowForgetQ(s, d)),
    // CCNet-style bigram-LM log-perplexity quality scores (en-trained)
    "q_ngram_lm" -> ((s, d) => Scoring.ngramLmQ(Tables.documents(s, d))),
    // interpolated Kneser-Ney bigram perplexity: absolute discounting
    // + continuation unigram, all stats from the observed-bigram table
    "q_kneser_ney" -> ((s, d) => Scoring.kneserNeyQ(Tables.documents(s, d))),
    // CCNet head/middle/tail perplexity terciles per language
    "q_ccnet_buckets" -> ((s, d) => Scoring.ccnetBucketsQ(Tables.documents(s, d))),
    // the THIRTEENTH persisted index: additive bigram-LM count
    // partials (doc-complete batches), perplexity scored under the fold
    "q_ngram_lm_incr" -> ((s, d) => graft.ops.LmIndex.ngramLmIncrQ(s, d)),
    // the SAME persisted count store read under the Kneser-Ney law -
    // switching smoothing is a reader change, no re-ingestion
    "q_kneser_ney_incr" -> ((s, d) => graft.ops.LmIndex.kneserNeyIncrQ(s, d)),
    // right-to-be-forgotten on an ADDITIVE-count index: the victims'
    // negative count ledger nets the model; survivors scored under it
    "q_lm_forget" -> ((s, d) => graft.ops.LmIndex.lmForgetQ(s, d)),
    // JS drift of the newest shard against the PERSISTED corpus
    // distribution — the LM index's third reader law (no base re-scan)
    "q_drift_incr" -> ((s, d) => graft.ops.LmIndex.driftIncrQ(s, d)),
    // two-sample Kolmogorov-Smirnov over per-source length
    // distributions — the nonparametric drift detector
    "q_ks_test" -> ((s, d) => Scoring.ksTestQ(Tables.documents(s, d))),
    // linear fasttext-style keep/drop classifier: hashed-bucket features,
    // integer-milli weight table broadcast, exact order-free logit
    "q_quality_clf" -> ((s, d) => Scoring.qualityClassifierQ(Tables.documents(s, d))),
    // exact tie-corrected ROC-AUC of the classifier logits against the
    // lang='en' weak label — grouped Mann-Whitney, all-integer until
    // the one final division
    "q_auc" -> ((s, d) => Scoring.aucQ(Tables.documents(s, d))),
    // the bounded-histogram scale form: same fold over ≤ 1024 bins
    "q_auc_binned" -> ((s, d) => Scoring.aucBinnedQ(Tables.documents(s, d))),
    // precision/recall/F1 at every distinct-logit threshold — exact
    // BIGINT confusion counts from descending running sums
    "q_pr_curve" -> ((s, d) => Scoring.prCurveQ(Tables.documents(s, d))),
    // expected calibration error: integer-micro confidences, 10 bins,
    // one final division
    "q_ece" -> ((s, d) => Scoring.eceQ(Tables.documents(s, d))),
    // Brier score: exact squared micro gaps, one scalar fold
    "q_brier" -> ((s, d) => Scoring.brierQ(Tables.documents(s, d))),
    // Spearman rank agreement between the classifier and the LM
    // scorer: row_number ranks with doc_id ties, all-BIGINT d^2 fold
    "q_rank_corr" -> ((s, d) => Scoring.rankCorrQ(Tables.documents(s, d))),
    // ColBERT-style MaxSim: per-query-term best-token integer dot
    // products, one codegen projection + one doc-keyed aggregate
    "q_maxsim" -> ((s, d) => Scoring.maxSimQ(Tables.documents(s, d))),
    // temperature-flattened (alpha=0.5) source rebalancing, min-anchored
    "q_sample_temp" -> ((s, d) => Sampling.temperatureQ(Tables.documents(s, d))),
    // DP count release: Laplace(1/eps) from a seeded inverse-CDF draw,
    // per-language, one partition-count aggregate
    "q_dp_release" -> ((s, d) => Sampling.dpReleaseQ(Tables.documents(s, d))),
    // exact-k deterministic per-stratum sample on the bounded-buffer
    // top-k aggregate (44-bit hash rank, engine-portable)
    "q_sample_k" -> ((s, d) => Sampling.sampleExactKQ(Tables.documents(s, d))),
    // weighted exact-k per-stratum draw (Efraimidis-Spirakis): longer
    // docs proportionally likelier, rounded-key cut, bounded-buffer top-k
    "q_sample_weighted" -> ((s, d) => Sampling.sampleWeightedKQ(Tables.documents(s, d))),
    // per-domain document cap (anti-host-dominance governance): bounded-
    // buffer top-k + pre-cap volume count in ONE domain-key aggregate
    "q_domain_cap" -> ((s, d) => Sampling.domainCapQ(Tables.documents(s, d))),
    // bounded-buffer per-group top-k aggregate (map-side partial top-k)
    "q_topk_agg" -> ((s, d) => Relational.topKAggQ(s, d))
  )

  /** The winnowing oracle, parameterized the same way as
    * [[dupClusterOracleSql]] so the batch (q_winnow) and incremental
    * (q_winnow_incr) gates share ONE text: k=4 token-gram 60-bit
    * hashes, w=5 window minima per doc, df cap 50 over whatever corpus
    * `src` names, then the pairs `pairCond` admits with ≥ 2 shared
    * fingerprints. */
  private def winnowOracleSql(docsCte: String, src: String,
      pairCond: String): String =
    s"""WITH $docsCte t AS (SELECT doc_id,
      |list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
      |FROM $src),
      |g AS (SELECT doc_id, list_transform(range(1, len(toks) - 2), i ->
      |CAST(('0x'||substr(md5(array_to_string(toks[i:i+3], ' ')),1,15)) AS BIGINT)) AS h
      |FROM t WHERE len(toks) >= 4),
      |f AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |range(1, greatest(len(h) - 4, 1) + 1),
      |p -> list_aggregate(h[p:p+4], 'min')))) AS fp FROM g),
      |c AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 50),
      |fc AS (SELECT f.doc_id, f.fp FROM f JOIN c USING (fp))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      |FROM fc a JOIN fc b ON a.fp = b.fp AND $pairCond
      |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin

  /** The containment-decontamination ground truth — shared by
    * q_decontaminate and q_decontaminate_bloom (the bloom is a pruning
    * layer whose false positives the exact join removes; the result
    * must be identical).  */
  private val DecontaminateOracleSql: String =
      """WITH ev AS (SELECT DISTINCT
        |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
        |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
        |FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents WHERE doc_id < 50) t WHERE len(toks) >= 8),
        |corp AS (SELECT DISTINCT doc_id,
        |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
        |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
        |FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents WHERE doc_id >= 50) t WHERE len(toks) >= 8)
        |SELECT doc_id, count(*) AS n_shingles,
        |CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev) THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev) THEN 1 ELSE 0 END) AS DOUBLE)/count(*) AS contamination
        |FROM corp GROUP BY doc_id
        |HAVING sum(CASE WHEN shingle IN (SELECT shingle FROM ev) THEN 1 ELSE 0 END) > 0""".stripMargin

  /** The exact-substring-dedup oracle, parameterized the same way as
    * [[winnowOracleSql]] so the batch (q_substring_dedup) and
    * incremental (q_substring_dedup_incr) gates share ONE text: L=8
    * token-gram 60-bit hashes, coverage-based token excision over
    * whatever corpus `src` names, final rows restricted by `where`. */
  private def substringOracleSql(docsCte: String, src: String,
      where: String): String =
    s"""WITH $docsCte t AS (SELECT doc_id,
      |list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
      |FROM $src),
      |ge AS (SELECT doc_id, s['pos'] AS pos, s['gh'] AS gh FROM
      |(SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6), i ->
      |{'pos': i, 'gh': CAST(('0x'||substr(md5(array_to_string(toks[i:i+7], ' ')),1,15)) AS BIGINT)})) AS s
      |FROM t WHERE len(toks) >= 8) z),
      |dup AS (SELECT gh FROM ge GROUP BY gh HAVING count(*) >= 2),
      |cov AS (SELECT DISTINCT doc_id, q FROM
      |(SELECT doc_id, unnest(range(pos, pos + 8)) AS q
      |FROM ge JOIN dup USING (gh)) z),
      |cv AS (SELECT doc_id, list(q) AS covs FROM cov GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |CAST(coalesce(len(cv.covs), 0) AS BIGINT) AS n_removed,
      |coalesce(array_to_string(list_transform(
      |list_filter(range(1, len(t.toks) + 1),
      |i -> NOT list_contains(coalesce(cv.covs, []), i)),
      |i -> t.toks[i]), ' '), '') AS clean_text
      |FROM t LEFT JOIN cv USING (doc_id) $where""".stripMargin

  /** The audio chroma-dedup oracle: per-window band-energy difference
    * fingerprints (windows of 32 samples at hop 16, 8 bands of 4 — band
    * width divides the hop, so every band energy is one of the
    * non-overlapping 4-sample partial sums b4; window t >= 1 bits: 7
    * spectral E(t,b) > E(t,b+1) + 8 temporal E(t,b) > E(t-1,b)) over
    * each payload and its one-sample-corrupted re-encode variant
    * (doc_id + 100000); pairs share >= 3 distinct fingerprints under
    * the 2..50 df cap. `pairCond` restricts the pair set (the
    * incremental gate keeps only base x variant pairs, the
    * delta-vs-index contract). ASCII-payload contract as image/video
    * (DuckDB unicode() vs Spark ascii() agree only on ASCII). */
  private def audioOracleSql(pairCond: String): String =
    s"""WITH base AS (SELECT doc_id, text FROM documents WHERE length(text) >= 48),
      |v AS (SELECT doc_id + 100000 AS doc_id,
      |substr(text, 1, greatest(1, CAST(floor(length(text)/2) AS INT)) - 1) || '~' ||
      |substr(text, greatest(1, CAST(floor(length(text)/2) AS INT)) + 1, length(text)) AS text
      |FROM base),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM v),
      |a AS (SELECT doc_id,
      |list_transform(range(0, CAST(floor(length(text)/4) AS BIGINT)), j ->
      |CAST(unicode(substr(text, CAST(4*j+1 AS INT), 1))
      |+ unicode(substr(text, CAST(4*j+2 AS INT), 1))
      |+ unicode(substr(text, CAST(4*j+3 AS INT), 1))
      |+ unicode(substr(text, CAST(4*j+4 AS INT), 1)) AS BIGINT)) AS b4,
      |CAST(1 + floor((length(text) - 32)/16) AS BIGINT) AS nw FROM u),
      |w AS (SELECT doc_id, b4, unnest(range(1, nw)) AS t FROM a),
      |f AS (SELECT DISTINCT doc_id, CAST(
      |list_sum(list_transform(range(0, 7), b ->
      |CASE WHEN b4[4*t+b+1] > b4[4*t+b+2]
      |THEN (1::BIGINT << b) ELSE 0::BIGINT END)) +
      |list_sum(list_transform(range(0, 8), b ->
      |CASE WHEN b4[4*t+b+1] > b4[4*t+b-3]
      |THEN (1::BIGINT << (7+b)) ELSE 0::BIGINT END)) +
      |list_sum(list_transform(range(0, 7), b ->
      |CASE WHEN abs(b4[4*t+b+1] - b4[4*t+b+2]) > 16
      |THEN (1::BIGINT << (15+b)) ELSE 0::BIGINT END)) +
      |list_sum(list_transform(range(0, 8), b ->
      |CASE WHEN abs(b4[4*t+b+1] - b4[4*t+b-3]) > 16
      |THEN (1::BIGINT << (22+b)) ELSE 0::BIGINT END))
      |AS BIGINT) AS fp FROM w),
      |sz AS (SELECT fp, count(DISTINCT doc_id) AS df FROM f GROUP BY fp),
      |p AS (SELECT a.doc_id AS aud_a, b.doc_id AS aud_b, count(*) AS n_shared
      |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id $pairCond
      |JOIN sz ON sz.fp = a.fp AND sz.df BETWEEN 2 AND 50
      |GROUP BY 1, 2)
      |SELECT aud_a, aud_b, CAST(n_shared AS BIGINT) AS n_shared
      |FROM p WHERE n_shared >= 3""".stripMargin

  /** The perceptual-dedup oracle: 60-bit dHash over the decoded (stub:
    * code-point) sequence of each payload and its one-byte-corrupted
    * re-encode variant (doc_id + 100000); full O(n²) pairwise scan at
    * hamming ≤ 3 — the banded join must equal it exactly (pigeonhole).
    * `pairCond` restricts the pair set (the incremental gate keeps only
    * base × variant pairs, the delta-vs-index contract).
    *
    * ASCII-payload contract: the oracle samples code points (DuckDB
    * unicode()) where the engine's native DHash60 records Spark ascii()
    * semantics (signed first UTF-8 byte) — identical on the fixture's
    * guaranteed-ASCII payloads; a multibyte corpus would need the oracle
    * to sample the character's first byte instead. */
  private def imageOracleSql(pairCond: String): String =
    s"""WITH base AS (SELECT doc_id, text FROM documents WHERE length(text) >= 1),
      |v AS (SELECT doc_id + 100000 AS doc_id,
      |substr(text, 1, greatest(1, CAST(floor(length(text)/2) AS INT)) - 1) || '~' ||
      |substr(text, greatest(1, CAST(floor(length(text)/2) AS INT)) + 1, length(text)) AS text
      |FROM base),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM v),
      |c AS (SELECT doc_id, list_transform(range(0, 61), i ->
      |unicode(substr(text, CAST(floor(i*(length(text)-1)/60) AS INT) + 1, 1))) AS cs
      |FROM u),
      |f AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), j ->
      |CASE WHEN cs[j+1] < cs[j+2] THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS fp
      |FROM c)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
      |FROM f a JOIN f b ON a.doc_id < b.doc_id $pairCond
      |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin

  /** The dup-clustering oracle, parameterized over its document source
    * so the batch (q_dup_clusters) and incremental (q_dup_clusters_incr)
    * gates share ONE text: banded minhash pairs, two star-contraction
    * levels, recursive min-label walk on the residual graph (shape
    * rationale at the q_dup_clusters registration). `docsCte` prepends
    * an optional CTE (e.g. the re-keyed corpus ∪ delta union) and `src`
    * names the table the tokenizer reads. */
  /** The MMR oracle: the greedy diversity re-rank unrolled as `kOut`
    * argmax CTEs (the PageRank unrolled-rounds structure) over the
    * identical nano-grid relevance and pairwise-sim tables — step 1 is
    * the pure relevance argmax (no selected set), step t maximizes
    * 7·rel − 3·max_{selected} sim with the vec_id tie-break. */
  private def mmrOracleSql(nCand: Int, kOut: Int): String = {
    val head =
      s"""WITH n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings) e WHERE list_dot_product(v, v) > 0),
        |p AS (SELECT v AS pv, nrm AS pn FROM n WHERE vec_id = 0),
        |cand AS (SELECT vec_id,
        |CAST(floor(list_dot_product(v, pv)/(nrm*pn)*1e9) AS BIGINT) AS rel, v, nrm
        |FROM n, p WHERE vec_id <> 0 ORDER BY rel DESC, vec_id ASC LIMIT $nCand),
        |sims AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
        |CAST(floor(list_dot_product(a.v, b.v)/(a.nrm*b.nrm)*1e9) AS BIGINT) AS s
        |FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
        |s1 AS (SELECT vec_id, rel, CAST(7*rel AS BIGINT) AS mmr FROM cand
        |ORDER BY rel DESC, vec_id ASC LIMIT 1),
        |sel1 AS (SELECT vec_id FROM s1)""".stripMargin
    val steps = (2 to kOut).map { t =>
      s"""s$t AS (SELECT c.vec_id, c.rel,
        |CAST(7*c.rel - 3*(SELECT max(s) FROM sims
        |WHERE ia = c.vec_id AND ib IN (SELECT vec_id FROM sel${t - 1})) AS BIGINT) AS mmr
        |FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
        |ORDER BY mmr DESC, c.vec_id ASC LIMIT 1),
        |sel$t AS (SELECT vec_id FROM sel${t - 1} UNION ALL SELECT vec_id FROM s$t)""".stripMargin
    }
    val out = (1 to kOut).map(t =>
      s"SELECT CAST($t AS BIGINT) AS rank, vec_id, rel AS rel_nano, mmr AS mmr_nano FROM s$t")
      .mkString("\nUNION ALL ")
    (head +: steps).mkString(",\n") + "\n" + out
  }

  /** The multi-probe MMR oracle: the [[mmrOracleSql]] greedy unrolled
    * per step but computed for ALL probes at once — each step's argmax
    * is a row_number over probe_id, the maxsim subquery correlates on
    * (probe_id, candidate), and sel_t accumulates (probe_id, vec_id)
    * pairs. Probes = vec_id < nProbes; candidates per probe = that
    * probe's top-nCand relevance list (corpus minus the probe). */
  private def mmrBatchOracleSql(nProbes: Int, nCand: Int, kOut: Int): String = {
    val head =
      s"""WITH n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings) e WHERE list_dot_product(v, v) > 0),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pn FROM n
        |WHERE vec_id < $nProbes),
        |cand0 AS (SELECT probe_id, n.vec_id AS vec_id,
        |CAST(floor(list_dot_product(n.v, pv)/(n.nrm*pn)*1e9) AS BIGINT) AS rel,
        |n.v AS v, n.nrm AS nrm
        |FROM n CROSS JOIN p WHERE n.vec_id <> p.probe_id),
        |cand AS (SELECT probe_id, vec_id, rel, v, nrm FROM (
        |SELECT *, row_number() OVER (PARTITION BY probe_id
        |ORDER BY rel DESC, vec_id ASC) AS rn FROM cand0) t WHERE rn <= $nCand),
        |sims AS (SELECT a.probe_id, a.vec_id AS ia, b.vec_id AS ib,
        |CAST(floor(list_dot_product(a.v, b.v)/(a.nrm*b.nrm)*1e9) AS BIGINT) AS s
        |FROM cand a JOIN cand b
        |ON a.probe_id = b.probe_id AND a.vec_id <> b.vec_id),
        |s1 AS (SELECT probe_id, vec_id, rel, CAST(7*rel AS BIGINT) AS mmr FROM (
        |SELECT *, row_number() OVER (PARTITION BY probe_id
        |ORDER BY rel DESC, vec_id ASC) AS rn FROM cand) t WHERE rn = 1),
        |sel1 AS (SELECT probe_id, vec_id FROM s1)""".stripMargin
    val steps = (2 to kOut).map { t =>
      s"""s$t AS (SELECT probe_id, vec_id, rel, mmr FROM (
        |SELECT *, row_number() OVER (PARTITION BY probe_id
        |ORDER BY mmr DESC, vec_id ASC) AS rn FROM (
        |SELECT c.probe_id, c.vec_id, c.rel,
        |CAST(7*c.rel - 3*(SELECT max(s) FROM sims
        |WHERE sims.probe_id = c.probe_id AND sims.ia = c.vec_id
        |AND sims.ib IN (SELECT vec_id FROM sel${t - 1} sl
        |WHERE sl.probe_id = c.probe_id)) AS BIGINT) AS mmr
        |FROM cand c WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} sl2
        |WHERE sl2.probe_id = c.probe_id AND sl2.vec_id = c.vec_id)) u) t
        |WHERE rn = 1),
        |sel$t AS (SELECT probe_id, vec_id FROM sel${t - 1}
        |UNION ALL SELECT probe_id, vec_id FROM s$t)""".stripMargin
    }
    val out = (1 to kOut).map(t =>
      s"SELECT probe_id, CAST($t AS BIGINT) AS rank, vec_id, " +
        s"rel AS rel_nano, mmr AS mmr_nano FROM s$t")
      .mkString("\nUNION ALL ")
    (head +: steps).mkString(",\n") + "\n" + out
  }

  /** The BM25 oracle — shared by the batch q_bm25 and the inverted-
    * index read q_bm25_incr (postings over corpus ∪ delta must score
    * identically to the batch pass over all documents). */
  /** The BM25 oracle text, optionally over a filtered corpus slice
    * (q_forget/q_forget_purge score the index after deletion, which
    * must equal the batch scorer over the SURVIVING docs). */
  private def bm25OracleSqlOver(where: String): String =
    s"""WITH tok AS (SELECT doc_id, t AS token FROM
      |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
      |FROM documents $where) u WHERE t <> ''),""".stripMargin + "\n" +
    """dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
      |WHERE token IN ('data', 'query', 'engine', 'fast') GROUP BY token),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
      |WHERE token IN ('data', 'query', 'engine', 'fast') GROUP BY doc_id, token)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
      |round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2
      |/ (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
      |FROM tf JOIN dfx USING (token) JOIN dl USING (doc_id), st
      |GROUP BY doc_id""".stripMargin

  /** The incremental near-dup oracle, with an optional extra predicate
    * on the INDEX (b) side of the candidate join — q_dedup_forget
    * filters the forgotten corpus ids off exactly there. */
  private def nearDupIncrOracleSql(bFilter: String): String =
    """WITH docs2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
          |UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0),
          |tok AS (SELECT DISTINCT doc_id, t AS token FROM
          |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
          |FROM docs2) u WHERE t <> ''),
          |sig AS (SELECT doc_id,
          |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
          |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
          |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
          |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
          |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
          |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
          |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
          |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
          |FROM tok GROUP BY doc_id),
          |bands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM sig
          |UNION ALL SELECT doc_id, 1, h2, h3 FROM sig
          |UNION ALL SELECT doc_id, 2, h4, h5 FROM sig
          |UNION ALL SELECT doc_id, 3, h6, h7 FROM sig),
          |delta_ids AS (SELECT doc_id + 100000 AS doc_id FROM documents WHERE doc_id % 20 = 0),
          |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a
          |JOIN bands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
          |WHERE a.doc_id IN (SELECT doc_id FROM delta_ids)
          |AND b.doc_id NOT IN (SELECT doc_id FROM delta_ids)),
          |tokh AS (SELECT DISTINCT doc_id,
          |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) AS th FROM tok),
          |sizes AS (SELECT doc_id, count(*) AS n_tok FROM tokh GROUP BY doc_id),
          |common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM cand c
          |JOIN tokh ta ON ta.doc_id = c.doc_a
          |JOIN tokh tb ON tb.doc_id = c.doc_b AND tb.th = ta.th
          |GROUP BY c.doc_a, c.doc_b)
          |SELECT c.doc_a, c.doc_b,
          |CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) AS jaccard
          |FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
          |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) >= 0.5""".stripMargin
      .replace("AND b.doc_id NOT IN (SELECT doc_id FROM delta_ids)",
        "AND b.doc_id NOT IN (SELECT doc_id FROM delta_ids)" + bFilter)

  /** Entity-inventory oracle — shared by the batch q_entities and the
    * index fold q_entities_incr (per-doc rows additive under
    * doc-complete batches). */
  /** The `where` parametrization serves q_entity_forget (the
    * survivor-corpus inventory IS the forgotten index's ground truth). */
  private def entitiesOracleSqlOver(where: String = ""): String =
    s"""WITH aug AS (SELECT doc_id,
        |text || ' contact user' || CAST(doc_id AS VARCHAR)
        ||| '@mail.example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
        ||| '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        ||| ' id ' || CAST(doc_id + 100000000 AS VARCHAR)
        ||| ' phone 555-867-5309' AS t FROM documents $where),
        |e AS (SELECT doc_id, 'email' AS kind,
        |unnest(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS entity FROM aug
        |UNION ALL SELECT doc_id, 'ip',
        |unnest(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) FROM aug
        |UNION ALL SELECT doc_id, 'phone',
        |unnest(regexp_extract_all(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) FROM aug
        |UNION ALL SELECT doc_id, 'id',
        |unnest(regexp_extract_all(t, '\\b\\d{9,}\\b')) FROM aug)
        |SELECT kind, entity, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM e GROUP BY kind, entity""".stripMargin

  private val EntitiesOracleSql: String = entitiesOracleSqlOver()

  /** MaxSim oracle: distinct (doc, token) × 16 dims via lateral range,
    * per-(doc, token) integer dots against each query term's identical
    * md5-derived vector, per-doc max per term, summed. */
  private val MaxSimOracleSql: String = {
    val terms = Seq("data", "query", "engine", "fast")
    val dotCols = terms.zipWithIndex.map { case (t, i) =>
      s"sum(vd * (CAST(('0x'||substr(md5('e:$t:'||CAST(j AS VARCHAR)),1,15)) AS BIGINT) % 2001 - 1000)) AS d$i"
    }.mkString(",\n")
    val maxCols = terms.indices.map(i => s"max(d$i) AS m$i").mkString(", ")
    val sumExpr = terms.indices.map(i => s"m$i").mkString(" + ")
    s"""WITH tok AS (SELECT DISTINCT doc_id, t AS token FROM
       |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
       |FROM documents) u WHERE t <> ''),
       |comp AS (SELECT doc_id, token, j,
       |CAST(('0x'||substr(md5('e:'||token||':'||CAST(j AS VARCHAR)),1,15)) AS BIGINT) % 2001 - 1000 AS vd
       |FROM tok, unnest(range(0, 16)) t2(j)),
       |d AS (SELECT doc_id, token,
       |$dotCols
       |FROM comp GROUP BY doc_id, token),
       |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_tokens,
       |$maxCols FROM d GROUP BY doc_id)
       |SELECT doc_id, n_distinct_tokens,
       |CAST($sumExpr AS BIGINT) AS maxsim FROM m""".stripMargin
  }

  /** Kneser-Ney oracle text - shared by the batch q_kneser_ney and
    * the index-read q_kneser_ney_incr (count additivity over
    * doc-complete batches makes the batch replay the law). */
  private val KneserNeyOracleSql: String =
      """WITH t AS (SELECT doc_id, lang,
        |list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
        |FROM documents),
        |tr AS (SELECT toks[i] AS a, toks[i+1] AS b
        |FROM (SELECT toks, unnest(range(1, len(toks)+1)) AS i FROM t WHERE lang = 'en') z),
        |uni AS (SELECT a, count(*) AS n_u FROM tr GROUP BY a),
        |bi AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM tr
        |WHERE b IS NOT NULL GROUP BY a, b),
        |ctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS cv,
        |CAST(count(*) AS BIGINT) AS n1f FROM bi GROUP BY a),
        |pred AS (SELECT b, CAST(count(*) AS BIGINT) AS n1p FROM bi GROUP BY b),
        |sc2 AS (SELECT CAST((SELECT count(*) FROM bi) AS BIGINT) AS nbb,
        |CAST((SELECT count(*) FROM uni) AS BIGINT) AS v),
        |sc AS (SELECT doc_id, lang, toks[i] AS ra, toks[i+1] AS rb
        |FROM (SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i
        |FROM t WHERE len(toks) >= 2) z),
        |m AS (SELECT doc_id, lang,
        |CASE WHEN ua.a IS NULL THEN '<unk>' ELSE sc.ra END AS a,
        |CASE WHEN ub.a IS NULL THEN '<unk>' ELSE sc.rb END AS b
        |FROM sc LEFT JOIN uni ua ON sc.ra = ua.a LEFT JOIN uni ub ON sc.rb = ub.a),
        |pr AS (SELECT doc_id, lang,
        |CASE WHEN ctx.cv IS NULL
        |THEN (CAST(coalesce(pred.n1p, 0) AS DOUBLE) + 1.0) / CAST(nbb + v + 1 AS DOUBLE)
        |ELSE greatest(CAST(coalesce(bi.n_ab, 0) AS DOUBLE) - 0.75, 0.0) / CAST(ctx.cv AS DOUBLE)
        |+ 0.75 * CAST(ctx.n1f AS DOUBLE) / CAST(ctx.cv AS DOUBLE)
        |* ((CAST(coalesce(pred.n1p, 0) AS DOUBLE) + 1.0) / CAST(nbb + v + 1 AS DOUBLE))
        |END AS prob
        |FROM m LEFT JOIN bi ON m.a = bi.a AND m.b = bi.b
        |LEFT JOIN ctx ON m.a = ctx.a LEFT JOIN pred ON m.b = pred.b, sc2)
        |SELECT doc_id, lang, count(*) AS n_bigrams,
        |round(-avg(ln(prob)), 6) AS logppl
        |FROM pr GROUP BY doc_id, lang""".stripMargin

  private val Bm25OracleSql: String = bm25OracleSqlOver("")

  /** The phrase-search oracle — shared by the batch q_phrase_search
    * and the positional-index read q_phrase_search_incr (postings over
    * corpus ∪ delta must match identically to the batch adjacency pass
    * over all documents). Gram list per (doc, phrase length), exact
    * string equality, 1-based first position. */
  private def phraseOracleSqlOver(where: String): String =
    s"""WITH t AS (SELECT doc_id,
      |regexp_split_to_array(lower(trim(text)), '\\s+') AS tk FROM documents $where),""".stripMargin + "\n" +
    """p AS (SELECT unnest(['table scan','hash join','sort merge','sort merge join']) AS phrase),
      |g AS (SELECT doc_id, phrase, len(string_split(phrase, ' ')) AS m, tk
      |FROM t CROSS JOIN p),
      |r AS (SELECT phrase, doc_id,
      |list_transform(range(1, len(tk) - m + 2),
      |i -> array_to_string(tk[i : i + m - 1], ' ')) AS grams
      |FROM g WHERE len(tk) >= m)
      |SELECT phrase, doc_id,
      |CAST(len(list_filter(grams, x -> x = phrase)) AS BIGINT) AS n_matches,
      |CAST(list_position(grams, phrase) AS BIGINT) AS first_pos
      |FROM r WHERE list_position(grams, phrase) > 0""".stripMargin

  private val PhraseOracleSql: String = phraseOracleSqlOver("")

  /** The per-source data-card oracle — shared by the batch
    * q_corpus_report and the index-read q_corpus_report_incr (the
    * additive index over corpus ∪ delta must reproduce the batch
    * report over all documents exactly). */
  /** Shared by q_cms_topk and q_cms_incr (additivity law: the folded
    * incremental sketch equals the batch sketch over the union):
    * replays the 4×1024 count-min grid with the portable md5-15-nibble
    * row hashes and reads the top-20 exact tokens' estimates. */
  private val CmsOracleSql: String =
    """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
      |FROM documents),
      |tc AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok
      |WHERE token <> '' GROUP BY token),
      |ds AS (SELECT unnest([0,1,2,3]) AS d),
      |sk AS (SELECT d,
      |CAST(('0x'||substr(md5('cms'||CAST(d AS VARCHAR)||':'||token),1,15)) AS BIGINT) % 1024 AS bucket,
      |sum(n) AS c FROM tc CROSS JOIN ds GROUP BY 1, 2),
      |top AS (SELECT token, n AS n_exact FROM tc ORDER BY n DESC, token ASC LIMIT 20),
      |pr AS (SELECT token, n_exact, d,
      |CAST(('0x'||substr(md5('cms'||CAST(d AS VARCHAR)||':'||token),1,15)) AS BIGINT) % 1024 AS bucket
      |FROM top CROSS JOIN ds)
      |SELECT pr.token, pr.n_exact, CAST(min(sk.c) AS BIGINT) AS n_est
      |FROM pr JOIN sk USING (d, bucket) GROUP BY 1, 2""".stripMargin

  /** Shared by q_ngram_lm and q_ngram_lm_incr (the folded count
    * partials equal the batch grouping-sets model — additivity law);
    * the `where` parametrization serves q_lm_forget (train AND score
    * over the surviving corpus only). */
  private def ngramLmOracleSqlOver(where: String): String =
    s"""WITH t AS (SELECT doc_id, lang,
      |list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
      |FROM documents $where),""".stripMargin + "\n" +
    """tr AS (SELECT toks[i] AS a, toks[i+1] AS b
      |FROM (SELECT toks, unnest(range(1, len(toks)+1)) AS i FROM t WHERE lang = 'en') z),
      |uni AS (SELECT a, count(*) AS n_u FROM tr GROUP BY a),
      |bi AS (SELECT a, b, count(*) AS n_ab FROM tr WHERE b IS NOT NULL GROUP BY a, b),
      |vs AS (SELECT count(*) AS v FROM uni),
      |sc AS (SELECT doc_id, lang, toks[i] AS ra, toks[i+1] AS rb
      |FROM (SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i
      |FROM t WHERE len(toks) >= 2) z),
      |m AS (SELECT doc_id, lang,
      |CASE WHEN ua.a IS NULL THEN '<unk>' ELSE sc.ra END AS a,
      |CASE WHEN ub.a IS NULL THEN '<unk>' ELSE sc.rb END AS b
      |FROM sc LEFT JOIN uni ua ON sc.ra = ua.a LEFT JOIN uni ub ON sc.rb = ub.a),
      |pr AS (SELECT doc_id, lang,
      |(coalesce(bi.n_ab, 0) + 0.1) / (coalesce(uni.n_u, 0) + 0.1 * (v + 1)) AS prob
      |FROM m LEFT JOIN bi ON m.a = bi.a AND m.b = bi.b
      |LEFT JOIN uni ON m.a = uni.a, vs)
      |SELECT doc_id, lang, count(*) AS n_bigrams,
      |round(-avg(ln(prob)), 6) AS logppl
      |FROM pr GROUP BY doc_id, lang""".stripMargin

  private val NgramLmOracleSql: String = ngramLmOracleSqlOver("")

  /** The `where` parametrization serves q_corpus_report_forget (the
    * survivor-corpus card IS the forgotten index's ground truth). */
  private def corpusReportOracleSqlOver(where: String = ""): String =
    s"""WITH d AS (SELECT source, lang, CAST(length(text) AS BIGINT) AS n_chars,
      |CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok,
      |md5(text) AS h FROM documents $where),
      |dh AS (SELECT h, count(*) AS n_h FROM d GROUP BY h)
      |SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |CAST(sum(CASE WHEN n_h > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup
      |FROM d JOIN dh USING (h) GROUP BY source""".stripMargin

  private val CorpusReportOracleSql: String = corpusReportOracleSqlOver()

  /** The BPE-training oracle, generated per round count: word counts →
    * char segmentation, then k rounds of (pair count, argmax, greedy
    * merge). Every round's tables are MATERIALIZED at the top level
    * with the greedy application inside a NESTED `WITH RECURSIVE`
    * subquery — the same structure the dup-cluster oracle uses, because
    * chaining recursive CTEs directly re-evaluates each prior round
    * once per recursion step (exponential; measured as a hang at k=6,
    * 0.15 s in this form). The recursion walks each word's symbol list
    * left-to-right, consuming two symbols on a rule match and one
    * otherwise — the unique greedy leftmost non-overlapping matching
    * [[graft.ops.Bpe.applyMerge]]'s fold realizes. */
  /** Weighted-PageRank oracle: derive the transition graph, then
    * `iters` UNROLLED damped-update CTEs r1..rN, each reading the
    * previous — all in integer nano-rank arithmetic (`//` truncating
    * division on non-negative operands == Spark's DIV). */
  private def pageRankOracleSql(iters: Int,
      extraWhere: String = ""): String = {
    val base =
      s"""WITH ev AS (SELECT user_id, ts, event_id,
        |CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS node
        |FROM events WHERE regexp_extract(props, '"k":\\s*(\\d+)', 1) <> '' $extraWhere),""".stripMargin + "\n" +
      """tr AS (SELECT lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |node AS dst FROM ev),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr
        |WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
        |wo AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT node FROM
        |(SELECT src AS node FROM edges UNION SELECT dst FROM edges) u),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes)""".stripMargin
    val its = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         |CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
         |FROM nodes n LEFT JOIN
         |(SELECT e.dst AS node, sum((r.r * e.w) // w2.wout) AS s
         |FROM edges e JOIN wo w2 ON w2.src = e.src
         |JOIN r${i - 1} r ON r.node = e.src GROUP BY 1) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$its\n" +
      s"SELECT node, r AS rank_nano FROM r$iters ORDER BY r DESC, node ASC LIMIT 20"
  }

  /** Power iteration on the micro-quantized embedding matrix — `iters`
    * unrolled rounds of the exact integer fold (see
    * SimSearch.powerIterQ): s = sign·(|Σ x·v| div 10⁶) per vector,
    * w = Σ s·x per dimension, v' = sign(w)·(|w| div max(1, m div 10⁶)). */
  private def powerIterOracleSql(iters: Int): String = {
    val base =
      """WITH e AS (SELECT vec_id, j,
        |CAST(floor(CAST(embedding[CAST(j AS INT)+1] AS DOUBLE)*1000000) AS BIGINT) AS x
        |FROM embeddings, unnest(range(0, len(embedding))) AS t(j)),
        |v0 AS (SELECT DISTINCT j, CAST(1000000 AS BIGINT) AS v FROM e)""".stripMargin
    val its = (1 to iters).map { i =>
      s"""s$i AS (SELECT vec_id,
         |CAST(CASE WHEN sum(x*v) < 0 THEN -1 ELSE 1 END *
         |(abs(sum(x*v)) // 1000000) AS BIGINT) AS sr
         |FROM e JOIN v${i - 1} USING (j) GROUP BY vec_id),
         |w$i AS (SELECT j, CAST(sum(sr*x) AS BIGINT) AS w
         |FROM e JOIN s$i USING (vec_id) GROUP BY j),
         |m$i AS (SELECT greatest(1, max(abs(w)) // 1000000) AS dv FROM w$i),
         |v$i AS (SELECT j,
         |CAST(CASE WHEN w < 0 THEN -1 ELSE 1 END * (abs(w) // dv) AS BIGINT) AS v
         |FROM w$i, m$i)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$its\n" +
      s"SELECT CAST(j AS BIGINT) AS dim, v AS v_micro FROM v$iters"
  }

  /** HITS over the transition graph — the PageRank oracle's edge CTE,
    * then `iters` unrolled (authority, hub) update pairs, each with
    * max-norm renormalization on the nano grid (all values
    * nonnegative — truncating div == floor in both engines). */
  private def hitsOracleSql(iters: Int): String = {
    val base =
      """WITH ev AS (SELECT user_id, ts, event_id,
        |CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS node
        |FROM events WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> ''),
        |tr AS (SELECT lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |node AS dst FROM ev),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr
        |WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
        |nodes AS (SELECT DISTINCT node FROM
        |(SELECT src AS node FROM edges UNION SELECT dst FROM edges) u),
        |h0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS h FROM nodes)""".stripMargin
    val its = (1 to iters).map { i =>
      s"""a${i}r AS (SELECT e.dst AS node, sum(h.h * e.w) AS ar
         |FROM edges e JOIN h${i - 1} h ON h.node = e.src GROUP BY 1),
         |a${i}m AS (SELECT greatest(1, max(ar) // 1000000000) AS d FROM a${i}r),
         |a$i AS (SELECT n.node, CAST(coalesce(r.ar, 0) // d AS BIGINT) AS a
         |FROM nodes n LEFT JOIN a${i}r r ON r.node = n.node, a${i}m),
         |h${i}r AS (SELECT e.src AS node, sum(a.a * e.w) AS hr
         |FROM edges e JOIN a$i a ON a.node = e.dst GROUP BY 1),
         |h${i}m AS (SELECT greatest(1, max(hr) // 1000000000) AS d FROM h${i}r),
         |h$i AS (SELECT n.node, CAST(coalesce(r.hr, 0) // d AS BIGINT) AS h
         |FROM nodes n LEFT JOIN h${i}r r ON r.node = n.node, h${i}m)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$its\n" +
      s"SELECT node, a AS auth_nano, h AS hub_nano FROM a$iters JOIN h$iters USING (node) " +
      s"ORDER BY a DESC, node ASC LIMIT 20"
  }

  /** Synchronous LPA over the symmetrized transition graph — the same
    * edge-derivation CTE as the PageRank oracle, then `iters` unrolled
    * relabel rounds (max incident weight, min-label tie-break). */
  private def labelPropOracleSql(iters: Int): String = {
    val base =
      """WITH ev AS (SELECT user_id, ts, event_id,
        |CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS node
        |FROM events WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> ''),
        |tr AS (SELECT lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |node AS dst FROM ev),
        |edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr
        |WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
        |sym AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM
        |(SELECT src, dst, w FROM edges
        |UNION ALL SELECT dst AS src, src AS dst, w FROM edges) u GROUP BY 1, 2),
        |l0 AS (SELECT dst AS node, dst AS lab FROM (SELECT DISTINCT dst FROM sym) d)""".stripMargin
    val its = (1 to iters).map { i =>
      s"""l$i AS (SELECT dst AS node, lab FROM (
         |SELECT e.dst, l.lab, row_number() OVER (PARTITION BY e.dst
         |ORDER BY sum(e.w) DESC, l.lab ASC) AS rn
         |FROM sym e JOIN l${i - 1} l ON l.node = e.src
         |GROUP BY e.dst, l.lab) z WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$its\n" +
      s"SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_nodes " +
      s"FROM l$iters GROUP BY lab"
  }

  private def bpeOracleSql(k: Int): String = bpeOracleSql(k,
    (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, sym_a, sym_b, n_pair FROM m$r")
      .mkString("\nUNION ALL "))

  private def bpeOracleSql(k: Int, finalSelect: String,
      trainWhere: String = ""): String = {
    val head =
      s"""w AS MATERIALIZED (SELECT t AS word, count(*) AS n FROM
        |(SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t FROM documents $trainWhere) u
        |WHERE t <> '' GROUP BY t),
        |seg0 AS MATERIALIZED (SELECT word, n,
        |list_transform(range(1, length(word)+1), i -> substr(word, i, 1)) AS sym FROM w)""".stripMargin
    val rounds = (1 to k).map { r =>
      s"""pc$r AS MATERIALIZED (SELECT sym[i+1] AS sym_a, sym[i+2] AS sym_b,
        |CAST(sum(n) AS BIGINT) AS n_pair
        |FROM seg${r - 1}, unnest(range(0, len(sym)-1)) AS t(i) GROUP BY 1, 2),
        |m$r AS MATERIALIZED (SELECT sym_a, sym_b, n_pair FROM pc$r
        |ORDER BY n_pair DESC, sym_a ASC, sym_b ASC LIMIT 1),
        |seg$r AS MATERIALIZED (SELECT word, n, outx AS sym FROM (
        |WITH RECURSIVE app(word, n, lenx, pos, outx) AS (
        |SELECT s.word, s.n, len(s.sym), 1, CAST([] AS VARCHAR[]) FROM seg${r - 1} s
        |UNION ALL
        |SELECT a.word, a.n, a.lenx,
        |CASE WHEN a.pos < a.lenx AND s.sym[a.pos] = m.sym_a AND s.sym[a.pos+1] = m.sym_b
        |THEN a.pos + 2 ELSE a.pos + 1 END,
        |CASE WHEN a.pos < a.lenx AND s.sym[a.pos] = m.sym_a AND s.sym[a.pos+1] = m.sym_b
        |THEN list_append(a.outx, m.sym_a || m.sym_b) ELSE list_append(a.outx, s.sym[a.pos]) END
        |FROM app a JOIN seg${r - 1} s USING (word) CROSS JOIN m$r m
        |WHERE a.pos <= a.lenx)
        |SELECT word, n, outx FROM app WHERE pos > lenx) q)""".stripMargin
    }
    "WITH " + (head +: rounds).mkString(",\n") + "\n" + finalSelect
  }

  private val UnigramSeedMulti = graft.ops.Unigram.DefaultSeedMulti
  private val UnigramKeeps = graft.ops.Unigram.DefaultKeeps
  private val UnigramRounds = UnigramKeeps.length

  /** One Viterbi pass as a window-carried recursive CTE: the dp values
    * (piece count np, summed utility u, pieces-so-far sg) for the last
    * 4 code-point positions ride the row, each step extends by the
    * best piece of length 1..4 ending at pos+1 under vocab `prev`, and
    * "best" is one struct list_sort on the declared total order
    * (np asc, -u asc, -len asc) — the same objective the native
    * unigram_segment expression evaluates. Emits (word, n, sg). */
  private def unigramVitCte(name: String, prev: String): String = {
    val best = s"""(list_sort(list_filter([
      |CASE WHEN v.np0 IS NOT NULL AND p1.piece IS NOT NULL THEN
      |{'bnp': v.np0 + 1, 'bnu': -(v.u0 + p1.u), 'bnl': CAST(-1 AS BIGINT), 'bpc': p1.piece, 'bsg': v.sg0} END,
      |CASE WHEN v.pos >= 1 AND v.np1 IS NOT NULL AND p2.piece IS NOT NULL THEN
      |{'bnp': v.np1 + 1, 'bnu': -(v.u1 + p2.u), 'bnl': CAST(-2 AS BIGINT), 'bpc': p2.piece, 'bsg': v.sg1} END,
      |CASE WHEN v.pos >= 2 AND v.np2 IS NOT NULL AND p3.piece IS NOT NULL THEN
      |{'bnp': v.np2 + 1, 'bnu': -(v.u2 + p3.u), 'bnl': CAST(-3 AS BIGINT), 'bpc': p3.piece, 'bsg': v.sg2} END,
      |CASE WHEN v.pos >= 3 AND v.np3 IS NOT NULL AND p4.piece IS NOT NULL THEN
      |{'bnp': v.np3 + 1, 'bnu': -(v.u3 + p4.u), 'bnl': CAST(-4 AS BIGINT), 'bpc': p4.piece, 'bsg': v.sg3} END
      |], x -> x IS NOT NULL)))[1]""".stripMargin
    s"""$name AS MATERIALIZED (SELECT word, n, sg FROM (
      |WITH RECURSIVE vit(word, n, m, pos, np0, u0, sg0, np1, u1, sg1, np2, u2, sg2, np3, u3, sg3) AS (
      |SELECT word, n, CAST(length(word) AS BIGINT), CAST(0 AS BIGINT),
      |CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST([] AS VARCHAR[]),
      |CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR[]),
      |CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR[]),
      |CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR[])
      |FROM w
      |UNION ALL
      |SELECT v.word, v.n, v.m, v.pos + 1,
      |($best).bnp, -(($best).bnu), list_append(($best).bsg, ($best).bpc),
      |v.np0, v.u0, v.sg0, v.np1, v.u1, v.sg1, v.np2, v.u2, v.sg2
      |FROM vit v
      |LEFT JOIN $prev p1 ON p1.piece = substr(v.word, CAST(v.pos + 1 AS INT), 1)
      |LEFT JOIN $prev p2 ON v.pos >= 1 AND p2.piece = substr(v.word, CAST(v.pos AS INT), 2)
      |LEFT JOIN $prev p3 ON v.pos >= 2 AND p3.piece = substr(v.word, CAST(v.pos - 1 AS INT), 3)
      |LEFT JOIN $prev p4 ON v.pos >= 3 AND p4.piece = substr(v.word, CAST(v.pos - 2 AS INT), 4)
      |WHERE v.pos < v.m)
      |SELECT word, n, sg0 AS sg FROM vit WHERE pos = m) q)""".stripMargin
  }

  /** The full unigram train chain: seed candidates/charset/v0, then per
    * round r — Viterbi s_r under v_{r-1}, utilities u_r, pruned vocab
    * v_r (all chars + top-keep multi pieces). `encodeTail` appends one
    * more Viterbi under the final vocab for the encode query. */
  private def unigramOracleSql(finalSelect: String,
      encodeTail: Boolean = false): String = {
    val head =
      s"""w AS MATERIALIZED (SELECT t AS word, count(*) AS n FROM
        |(SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t FROM documents) u
        |WHERE t <> '' GROUP BY t),
        |cand AS MATERIALIZED (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
        |CAST(sum(n) AS BIGINT) AS u
        |FROM w, unnest(range(1, length(word)+1)) AS ti(i), unnest([1,2,3,4]) AS tl(l)
        |WHERE i + l - 1 <= length(word) GROUP BY 1),
        |chars AS MATERIALIZED (SELECT piece, u FROM cand WHERE length(piece) = 1),
        |v0 AS MATERIALIZED (SELECT piece, u FROM chars UNION ALL
        |SELECT piece, u FROM (SELECT piece, u FROM cand WHERE length(piece) > 1
        |ORDER BY u DESC, piece ASC LIMIT $UnigramSeedMulti) t)""".stripMargin
    val rounds = UnigramKeeps.zipWithIndex.map { case (keep, i) =>
      val r = i + 1
      s"""${unigramVitCte(s"s$r", s"v${r - 1}")},
        |u$r AS MATERIALIZED (SELECT piece, CAST(sum(n) AS BIGINT) AS u FROM
        |(SELECT n, unnest(sg) AS piece FROM s$r) t GROUP BY piece),
        |v$r AS MATERIALIZED (
        |SELECT c.piece, CAST(coalesce(u.u, 0) AS BIGINT) AS u
        |FROM (SELECT piece FROM chars) c LEFT JOIN u$r u USING (piece)
        |UNION ALL
        |SELECT piece, u FROM (SELECT piece, u FROM u$r WHERE length(piece) > 1
        |ORDER BY u DESC, piece ASC LIMIT $keep) t)""".stripMargin
    }
    val tail =
      if (encodeTail)
        Seq(unigramVitCte(s"s${UnigramRounds + 1}", s"v$UnigramRounds"))
      else Nil
    "WITH " + ((head +: rounds) ++ tail).mkString(",\n") + "\n" + finalSelect
  }

  /** The q_e2e_corpus oracle tail — extends the generated BPE chain
    * (seg6 = the raw-corpus tokenizer) with: the q_corpus_clean per-doc
    * verdict chain, a near-dup victim stage (the q_dedup_near text over
    * the corpus, victims = pair right sides at Jaccard ≥ 0.5), the
    * substring-excision text nested as one CTE over the keep set, and
    * the q_tokenize_pack encode/pack/shard tail over the excised
    * survivors. Emits the drop-attrition rows plus the per-shard pack
    * manifest. */
  private def e2eCorpusOracleTail: String =
    """,enc AS (SELECT word, CAST(len(sym) AS BIGINT) AS n_sym FROM seg6),
      |corpus AS MATERIALIZED (SELECT doc_id, text, lang FROM documents WHERE doc_id >= 50),
      |q AS (SELECT doc_id, CAST((n_tok >= 10
      |AND CAST(punct AS DOUBLE)/nullif(length(text), 0) < 0.3
      |AND CAST(stop_hits AS DOUBLE)/n_tok > 0.01) AS BIGINT) AS q_keep
      |FROM (SELECT doc_id, text,
      |len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok,
      |len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS punct,
      |len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |x -> x IN ('the','a','an','and','of','to','in','is','on','for'))) AS stop_hits
      |FROM corpus) t),
      |rtoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |FROM corpus),
      |r2 AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN 1.0 -
      |CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
      |/ (len(toks) - 1) ELSE 0.0 END AS dup2 FROM rtoks),
      |tc AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_nonempty FROM (
      |SELECT doc_id, tok, count(*) AS c FROM (SELECT doc_id, unnest(toks) AS tok FROM rtoks) u
      |WHERE tok <> '' GROUP BY doc_id, tok) g GROUP BY doc_id),
      |r AS (SELECT r2.doc_id,
      |CAST((CAST(top_c AS DOUBLE)/n_nonempty < 0.2 AND dup2 < 0.2) AS BIGINT) AS r_keep
      |FROM r2 JOIN tc ON tc.doc_id = r2.doc_id),
      |d AS (SELECT doc_id, CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY
      |md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) THEN 1 ELSE 0 END AS is_dup
      |FROM corpus),
      |ev AS (SELECT DISTINCT
      |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
      |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
      |FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |FROM documents WHERE doc_id < 50) t WHERE len(toks) >= 8),
      |corp AS (SELECT DISTINCT doc_id,
      |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
      |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
      |FROM rtoks WHERE len(toks) >= 8),
      |ct AS (SELECT doc_id FROM corp GROUP BY doc_id
      |HAVING CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev) THEN 1 ELSE 0 END) AS DOUBLE)
      |/count(*) >= 0.05),
      |lab AS MATERIALIZED (SELECT c.doc_id, length(c.text) AS n_chars,
      |CASE WHEN c.lang <> 'en' THEN 'lang'
      |WHEN q.q_keep = 0 THEN 'quality'
      |WHEN coalesce(r.r_keep, 1) = 0 THEN 'repetition'
      |WHEN d.is_dup = 1 THEN 'duplicate'
      |WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
      |ELSE 'keep' END AS reason
      |FROM corpus c JOIN q USING (doc_id) LEFT JOIN r USING (doc_id)
      |JOIN d USING (doc_id) LEFT JOIN ct USING (doc_id)),
      |ndtok AS MATERIALIZED (SELECT DISTINCT doc_id, t AS token FROM
      |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |FROM corpus) u WHERE t <> ''),
      |ndsig AS (SELECT doc_id,
      |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
      |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
      |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
      |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
      |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
      |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
      |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
      |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
      |FROM ndtok GROUP BY doc_id),
      |ndbands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM ndsig
      |UNION ALL SELECT doc_id, 1, h2, h3 FROM ndsig
      |UNION ALL SELECT doc_id, 2, h4, h5 FROM ndsig
      |UNION ALL SELECT doc_id, 3, h6, h7 FROM ndsig),
      |ndcand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM ndbands a
      |JOIN ndbands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
      |AND a.doc_id < b.doc_id),
      |ndtokh AS MATERIALIZED (SELECT DISTINCT doc_id,
      |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) AS th FROM ndtok),
      |ndsizes AS (SELECT doc_id, count(*) AS n_tok FROM ndtokh GROUP BY doc_id),
      |ndcommon AS MATERIALIZED (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM ndcand c
      |JOIN ndtokh ta ON ta.doc_id = c.doc_a
      |JOIN ndtokh tb ON tb.doc_id = c.doc_b AND tb.th = ta.th
      |GROUP BY c.doc_a, c.doc_b),
      |ndvict AS MATERIALIZED (SELECT DISTINCT c.doc_b AS doc_id FROM ndcommon c
      |JOIN ndsizes sa ON sa.doc_id = c.doc_a JOIN ndsizes sb ON sb.doc_id = c.doc_b
      |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) >= 0.5),
      |lab2 AS MATERIALIZED (SELECT lab.doc_id, lab.n_chars,
      |CASE WHEN lab.reason IN ('keep','contaminated') AND v.doc_id IS NOT NULL
      |THEN 'near_duplicate' ELSE lab.reason END AS reason
      |FROM lab LEFT JOIN ndvict v USING (doc_id)),
      |keepers AS MATERIALIZED (SELECT c.doc_id, c.text FROM corpus c
      |JOIN lab2 USING (doc_id) WHERE lab2.reason = 'keep'),""".stripMargin + "\n" +
    s"sx AS MATERIALIZED (\n${substringOracleSql("", "keepers", "")}\n)," + "\n" +
    """dt AS (SELECT doc_id, t AS word FROM
      |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(clean_text)), '\s+')) AS t
      |FROM sx) u WHERE t <> ''),
      |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS enc_len
      |FROM dt JOIN enc USING (word) GROUP BY doc_id),
      |sh AS (SELECT doc_id,
      |CAST(('0x'||substr(md5('shard:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 16 AS shard,
      |CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS ok,
      |enc_len FROM dl),
      |pc AS (SELECT shard, doc_id, enc_len,
      |sum(enc_len) OVER (PARTITION BY shard ORDER BY ok ASC, doc_id ASC
      |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sh)
      |SELECT 'drop' AS stage, reason AS key, count(*) AS n_docs,
      |CAST(sum(n_chars) AS BIGINT) AS total,
      |CAST(NULL AS BIGINT) AS n_seqs, CAST(NULL AS BIGINT) AS last_seq
      |FROM lab2 WHERE reason <> 'keep' GROUP BY reason
      |UNION ALL
      |SELECT 'pack', CAST(shard AS VARCHAR), count(*), CAST(sum(enc_len) AS BIGINT),
      |CAST(count(DISTINCT CAST(floor((cum - enc_len) / 512.0) AS BIGINT)) AS BIGINT),
      |CAST(max(CAST(floor((cum - enc_len) / 512.0) AS BIGINT)) AS BIGINT)
      |FROM pc GROUP BY shard""".stripMargin

  /** The q_e2e_corpus_incr oracle tail — the steady-state replay:
    * `corpus` is the DELTA shard only (doc_id % 20 = 0), the clean /
    * exact-dup / contamination chains run over it unchanged, the
    * near-dup stage spans base ∪ delta with the incremental victim
    * rule (a delta doc pairing a base doc yields; within-delta pairs
    * keep higher-id-yields; base–base pairs are skipped), boilerplate
    * grams count over base ∪ delta-keepers with only keepers excised,
    * and seg6 is the BASE-trained tokenizer (trainWhere on the BPE
    * chain). Same output schema as the batch tail. */
  private def e2eCorpusIncrOracleTail: String =
    """,enc AS (SELECT word, CAST(len(sym) AS BIGINT) AS n_sym FROM seg6),
      |corpus AS MATERIALIZED (SELECT doc_id, text, lang FROM documents
      |WHERE doc_id >= 50 AND doc_id % 20 = 0),
      |q AS (SELECT doc_id, CAST((n_tok >= 10
      |AND CAST(punct AS DOUBLE)/nullif(length(text), 0) < 0.3
      |AND CAST(stop_hits AS DOUBLE)/n_tok > 0.01) AS BIGINT) AS q_keep
      |FROM (SELECT doc_id, text,
      |len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok,
      |len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS punct,
      |len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |x -> x IN ('the','a','an','and','of','to','in','is','on','for'))) AS stop_hits
      |FROM corpus) t),
      |rtoks AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |FROM corpus),
      |r2 AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN 1.0 -
      |CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
      |/ (len(toks) - 1) ELSE 0.0 END AS dup2 FROM rtoks),
      |tc AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_nonempty FROM (
      |SELECT doc_id, tok, count(*) AS c FROM (SELECT doc_id, unnest(toks) AS tok FROM rtoks) u
      |WHERE tok <> '' GROUP BY doc_id, tok) g GROUP BY doc_id),
      |r AS (SELECT r2.doc_id,
      |CAST((CAST(top_c AS DOUBLE)/n_nonempty < 0.2 AND dup2 < 0.2) AS BIGINT) AS r_keep
      |FROM r2 JOIN tc ON tc.doc_id = r2.doc_id),
      |d AS (SELECT doc_id, CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY
      |md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) THEN 1 ELSE 0 END AS is_dup
      |FROM corpus),
      |ev AS (SELECT DISTINCT
      |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
      |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
      |FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |FROM documents WHERE doc_id < 50) t WHERE len(toks) >= 8),
      |corp AS (SELECT DISTINCT doc_id,
      |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
      |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
      |FROM rtoks WHERE len(toks) >= 8),
      |ct AS (SELECT doc_id FROM corp GROUP BY doc_id
      |HAVING CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev) THEN 1 ELSE 0 END) AS DOUBLE)
      |/count(*) >= 0.05),
      |lab AS MATERIALIZED (SELECT c.doc_id, length(c.text) AS n_chars,
      |CASE WHEN c.lang <> 'en' THEN 'lang'
      |WHEN q.q_keep = 0 THEN 'quality'
      |WHEN coalesce(r.r_keep, 1) = 0 THEN 'repetition'
      |WHEN d.is_dup = 1 THEN 'duplicate'
      |WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
      |ELSE 'keep' END AS reason
      |FROM corpus c JOIN q USING (doc_id) LEFT JOIN r USING (doc_id)
      |JOIN d USING (doc_id) LEFT JOIN ct USING (doc_id)),
      |ndtok AS MATERIALIZED (SELECT DISTINCT doc_id, t AS token FROM
      |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |FROM documents WHERE doc_id >= 50) u WHERE t <> ''),
      |ndsig AS (SELECT doc_id,
      |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
      |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
      |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
      |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
      |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
      |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
      |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
      |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
      |FROM ndtok GROUP BY doc_id),
      |ndbands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM ndsig
      |UNION ALL SELECT doc_id, 1, h2, h3 FROM ndsig
      |UNION ALL SELECT doc_id, 2, h4, h5 FROM ndsig
      |UNION ALL SELECT doc_id, 3, h6, h7 FROM ndsig),
      |ndcand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM ndbands a
      |JOIN ndbands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
      |AND a.doc_id < b.doc_id
      |WHERE a.doc_id % 20 = 0 OR b.doc_id % 20 = 0),
      |ndtokh AS MATERIALIZED (SELECT DISTINCT doc_id,
      |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) AS th FROM ndtok),
      |ndsizes AS (SELECT doc_id, count(*) AS n_tok FROM ndtokh GROUP BY doc_id),
      |ndcommon AS MATERIALIZED (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM ndcand c
      |JOIN ndtokh ta ON ta.doc_id = c.doc_a
      |JOIN ndtokh tb ON tb.doc_id = c.doc_b AND tb.th = ta.th
      |GROUP BY c.doc_a, c.doc_b),
      |ndvict AS MATERIALIZED (SELECT DISTINCT vic AS doc_id FROM (
      |SELECT CASE WHEN c.doc_a % 20 = 0 AND c.doc_b % 20 <> 0 THEN c.doc_a
      |WHEN c.doc_b % 20 = 0 AND c.doc_a % 20 <> 0 THEN c.doc_b
      |ELSE c.doc_b END AS vic FROM ndcommon c
      |JOIN ndsizes sa ON sa.doc_id = c.doc_a JOIN ndsizes sb ON sb.doc_id = c.doc_b
      |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) >= 0.5) v
      |WHERE vic % 20 = 0),
      |lab2 AS MATERIALIZED (SELECT lab.doc_id, lab.n_chars,
      |CASE WHEN lab.reason IN ('keep','contaminated') AND v.doc_id IS NOT NULL
      |THEN 'near_duplicate' ELSE lab.reason END AS reason
      |FROM lab LEFT JOIN ndvict v USING (doc_id)),
      |keepers AS MATERIALIZED (SELECT c.doc_id, c.text FROM corpus c
      |JOIN lab2 USING (doc_id) WHERE lab2.reason = 'keep'),""".stripMargin + "\n" +
    s"sx AS MATERIALIZED (\n${substringOracleSql(
      "sxsrc AS (SELECT doc_id, text FROM documents WHERE doc_id >= 50 AND doc_id % 20 <> 0 UNION ALL SELECT doc_id, text FROM keepers),",
      "sxsrc", "WHERE t.doc_id % 20 = 0")}\n)," + "\n" +
    """dt AS (SELECT doc_id, t AS word FROM
      |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(clean_text)), '\s+')) AS t
      |FROM sx) u WHERE t <> ''),
      |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS enc_len
      |FROM dt JOIN enc USING (word) GROUP BY doc_id),
      |sh AS (SELECT doc_id,
      |CAST(('0x'||substr(md5('shard:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 16 AS shard,
      |CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS ok,
      |enc_len FROM dl),
      |pc AS (SELECT shard, doc_id, enc_len,
      |sum(enc_len) OVER (PARTITION BY shard ORDER BY ok ASC, doc_id ASC
      |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sh)
      |SELECT 'drop' AS stage, reason AS key, count(*) AS n_docs,
      |CAST(sum(n_chars) AS BIGINT) AS total,
      |CAST(NULL AS BIGINT) AS n_seqs, CAST(NULL AS BIGINT) AS last_seq
      |FROM lab2 WHERE reason <> 'keep' GROUP BY reason
      |UNION ALL
      |SELECT 'pack', CAST(shard AS VARCHAR), count(*), CAST(sum(enc_len) AS BIGINT),
      |CAST(count(DISTINCT CAST(floor((cum - enc_len) / 512.0) AS BIGINT)) AS BIGINT),
      |CAST(max(CAST(floor((cum - enc_len) / 512.0) AS BIGINT)) AS BIGINT)
      |FROM pc GROUP BY shard""".stripMargin

  private def dupClusterOracleSql(docsCte: String, src: String): String =
    s"""WITH $docsCte tok AS (SELECT DISTINCT doc_id, t AS token FROM
      |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
      |FROM $src) u WHERE t <> ''),
      |sig AS (SELECT doc_id,
      |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
      |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
      |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
      |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
      |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
      |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
      |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
      |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
      |FROM tok GROUP BY doc_id),
      |bands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM sig
      |UNION ALL SELECT doc_id, 1, h2, h3 FROM sig
      |UNION ALL SELECT doc_id, 2, h4, h5 FROM sig
      |UNION ALL SELECT doc_id, 3, h6, h7 FROM sig),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a
      |JOIN bands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
      |AND a.doc_id < b.doc_id),
      |tokh AS (SELECT DISTINCT doc_id,
      |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) AS th FROM tok),
      |sizes AS (SELECT doc_id, count(*) AS n_tok FROM tokh GROUP BY doc_id),
      |common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM cand c
      |JOIN tokh ta ON ta.doc_id = c.doc_a
      |JOIN tokh tb ON tb.doc_id = c.doc_b AND tb.th = ta.th
      |GROUP BY c.doc_a, c.doc_b),
      |pairs AS MATERIALIZED (SELECT c.doc_a, c.doc_b
      |FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
      |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) >= 0.5),
      |e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
      |UNION ALL SELECT doc_b, doc_a FROM pairs),
      |m1 AS MATERIALIZED (SELECT u, least(u, min(v)) AS m FROM e0 GROUP BY u),
      |e1 AS MATERIALIZED (SELECT DISTINCT ma.m AS u, mb.m AS v FROM e0
      |JOIN m1 ma ON ma.u = e0.u JOIN m1 mb ON mb.u = e0.v WHERE ma.m <> mb.m),
      |e1s AS MATERIALIZED (SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
      |m2 AS MATERIALIZED (SELECT u, least(u, min(v)) AS m FROM e1s GROUP BY u),
      |e2 AS MATERIALIZED (SELECT DISTINCT ma.m AS u, mb.m AS v FROM e1s
      |JOIN m2 ma ON ma.u = e1s.u JOIN m2 mb ON mb.u = e1s.v WHERE ma.m <> mb.m),
      |e2s AS MATERIALIZED (SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2),
      |wl AS MATERIALIZED (SELECT u, min(label) AS label FROM (
      |WITH RECURSIVE walk(u, label) AS (
      |SELECT DISTINCT u, u FROM e2s
      |UNION
      |SELECT e.v, w.label FROM walk w JOIN e2s e ON e.u = w.u
      |WHERE w.label < e.v)
      |SELECT u, label FROM walk) GROUP BY u),
      |lvl AS (SELECT m1.u AS doc_id, coalesce(m2.m, m1.m) AS s2
      |FROM m1 LEFT JOIN m2 ON m2.u = m1.m)
      |SELECT lvl.doc_id, coalesce(wl.label, lvl.s2) AS cluster
      |FROM lvl LEFT JOIN wl ON wl.u = lvl.s2""".stripMargin

  /** The exact brute-force cosine top-k oracle — declared for q_sim_topk
    * and reused as the ground-truth CTE of the trained-IVF recall gate. */
  private val SimTopKOracleSql: String =
    """WITH n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
      |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |FROM embeddings) e WHERE list_dot_product(v, v) > 0),
      |sims AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
      |list_dot_product(c.v, p.v)/(c.nrm*p.nrm) AS cos_sim
      |FROM n c JOIN n p ON p.vec_id < 5 AND c.vec_id <> p.vec_id)
      |SELECT * FROM (SELECT probe_id, neighbor_id, cos_sim,
      |CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rnk
      |FROM sims) t WHERE rnk <= 5""".stripMargin

  /** The sampled-centroid IVF oracle — declared for q_sim_topk_ivf and
    * reused by q_ann_recall (the recall audit joins it against the
    * exact [[SimTopKOracleSql]] ranking). */
  /** Shared by q_decontaminate_embed_ivf and its index-backed twin
    * q_decontaminate_embed_incr (bit-identical declared semantics). */
  private val DeconEmbedIvfOracleSql: String =
    """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |FROM embeddings),
      |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n
      |WHERE list_dot_product(v, v) > 0),
      |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
      |WHERE vec_id >= 1 AND vec_id < 17),
      |c AS (SELECT vec_id, v, nrm FROM nn WHERE vec_id % 50 <> 0),
      |asg AS (SELECT vec_id, v, nrm, cell FROM (
      |SELECT c.vec_id, c.v, c.nrm, cents.cell, row_number() OVER (
      |PARTITION BY c.vec_id
      |ORDER BY list_dot_product(c.v, cents.cv)/(c.nrm*cents.cn) DESC, cents.cell ASC) AS rn
      |FROM c CROSS JOIN cents) t WHERE rn = 1),
      |pc AS (SELECT eval_id, ev, en, cell FROM (
      |SELECT p.vec_id AS eval_id, p.v AS ev, p.nrm AS en, cents.cell,
      |row_number() OVER (PARTITION BY p.vec_id
      |ORDER BY list_dot_product(p.v, cents.cv)/(p.nrm*cents.cn) DESC, cents.cell ASC) AS cr
      |FROM nn p CROSS JOIN cents WHERE p.vec_id % 50 = 0) t WHERE cr <= 4),
      |s AS (SELECT a.vec_id, pc.eval_id,
      |list_dot_product(a.v, pc.ev)/(a.nrm*pc.en) AS cs
      |FROM asg a JOIN pc ON a.cell = pc.cell),
      |m AS (SELECT vec_id, eval_id, cs, row_number() OVER (
      |PARTITION BY vec_id ORDER BY cs DESC, eval_id ASC) AS rn FROM s)
      |SELECT vec_id, eval_id AS nearest_eval, round(cs, 6) AS cos_sim
      |FROM m WHERE rn = 1 AND cs >= 0.3""".stripMargin

  private val IvfTopKOracleSql: String =
    """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
      |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
      |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
      |WHERE vec_id >= 5 AND vec_id < 21),
      |asg AS (SELECT vec_id, v, nrm, cell FROM (
      |SELECT a.vec_id, a.v, a.nrm, c.cell, row_number() OVER (PARTITION BY a.vec_id
      |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
      |FROM nn a CROSS JOIN cents c) t WHERE rn = 1),
      |pc AS (SELECT probe_id, pv, pn, cell FROM (
      |SELECT p.vec_id AS probe_id, p.v AS pv, p.nrm AS pn, c.cell,
      |row_number() OVER (PARTITION BY p.vec_id
      |ORDER BY list_dot_product(p.v, c.cv)/(p.nrm*c.cn) DESC, c.cell ASC) AS cr
      |FROM nn p CROSS JOIN cents c WHERE p.vec_id < 5) t WHERE cr <= 2),
      |sims AS (SELECT pc.probe_id, a.vec_id AS neighbor_id,
      |list_dot_product(a.v, pc.pv)/(a.nrm*pc.pn) AS cos_sim
      |FROM asg a JOIN pc ON a.cell = pc.cell AND a.vec_id <> pc.probe_id)
      |SELECT * FROM (SELECT probe_id, neighbor_id, cos_sim,
      |CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rnk
      |FROM sims) t WHERE rnk <= 5""".stripMargin

  /** The exact per-column profile oracle — declared for q_profile and
    * reused (wrapped with the law booleans) by the two sketch-profile
    * gates, so all three profiles share ONE ground-truth text. */
  private val ProfileOracleSql: String =
    """SELECT 'l_orderkey' AS column_name, count(*) AS n_rows,
      |count(*) - count(l_orderkey) AS n_nulls, count(DISTINCT l_orderkey) AS n_distinct,
      |CAST(min(l_orderkey) AS DOUBLE) AS min_num, CAST(max(l_orderkey) AS DOUBLE) AS max_num,
      |CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM lineitem
      |UNION ALL SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
      |count(DISTINCT l_quantity), CAST(min(l_quantity) AS DOUBLE),
      |CAST(max(l_quantity) AS DOUBLE), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
      |count(DISTINCT l_extendedprice), CAST(min(l_extendedprice) AS DOUBLE),
      |CAST(max(l_extendedprice) AS DOUBLE), NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
      |count(DISTINCT l_shipdate), epoch(min(l_shipdate)), epoch(max(l_shipdate)),
      |NULL, NULL FROM lineitem
      |UNION ALL SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
      |count(DISTINCT l_returnflag), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |min(l_returnflag), max(l_returnflag) FROM lineitem
      |UNION ALL SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
      |count(DISTINCT l_linestatus), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |min(l_linestatus), max(l_linestatus) FROM lineitem""".stripMargin

  /** DuckDB-dialect equivalents (run by the driver's oracle harness on
    * views named after the parquet tables). Approximate operators are
    * declared through GATED forms — deterministic exact lanes plus
    * in-query error/recall-law booleans the oracle replays as exact
    * values + literal TRUE — so every declared query is hash-checked;
    * the same laws remain spec-pinned in RelationalSpec/LlmOpsSpec/
    * ProfileIndexSpec. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, CAST(floor(l_quantity) AS BIGINT) AS qty_int,
        |l_extendedprice*(1-l_discount) AS net_price,
        |l_extendedprice*(1-l_discount)*(1+l_tax) AS charged FROM lineitem""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate, l_returnflag FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |AND l_returnflag = 'R' AND l_linestatus LIKE 'F%'""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS sum_disc_price,
        |avg(l_quantity) AS avg_qty, min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // identical semantics to q_agg_group — the bucketed layout changes
    // the SCAN, never the answer, and this gate proves it
    "q_agg_group_bucketed" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS sum_disc_price,
        |avg(l_quantity) AS avg_qty, min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        |count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    // HLL gate: exact cardinality + the ±3·rsd law as literal TRUE
    "q_agg_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts_exact,
        |TRUE AS within_3rsd FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // GK-sketch rank-contract gate: exact group sizes + law booleans
    "q_quantile_approx" ->
      """SELECT l_returnflag, count(l_quantity) AS n, TRUE AS median_rank_ok,
        |TRUE AS p95_rank_ok FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(n_name, 'ALL') AS grp_nation, CAST(coalesce(y, -1) AS BIGINT) AS grp_year,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS revenue, count(*) AS n_orders
        |FROM (SELECT n_name, year(o_orderdate) AS y, o_totalprice FROM orders
        |JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey) t
        |GROUP BY ROLLUP(n_name, y)""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS grp_rf, coalesce(l_linestatus, 'ALL') AS grp_ls,
        |sum(l_quantity) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price,
        |count(*) AS n_rows FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, max(o.o_orderdate) AS asof_orderdate,
        |count(o.o_orderkey) AS n_prior_orders
        |FROM events e LEFT JOIN orders o
        |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |GROUP BY e.event_id, e.user_id""".stripMargin,
    "q_join_asof_tol" ->
      """SELECT e.event_id, e.user_id, max(o.o_orderdate) AS asof_orderdate,
        |count(o.o_orderkey) AS n_recent_orders
        |FROM events e LEFT JOIN orders o
        |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |AND o.o_orderdate >= CAST(e.ts AS DATE) - 365
        |GROUP BY e.event_id, e.user_id""".stripMargin,
    "q_subquery" -> graft.ops.Relational.SubqueryQText,
    "q_lateral" -> graft.ops.Relational.LateralQText,
    "q_recursive_cte" -> graft.ops.Relational.RecursiveCteQText,
    "q_join_range" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS band_id, count(*) AS n_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total
        |FROM orders JOIN nation
        |ON o_totalprice BETWEEN n_nationkey * 20000.0 AND n_nationkey * 20000.0 + 39999.99
        |GROUP BY n_nationkey""".stripMargin,
    "q_join_inner" ->
      """SELECT c_mktsegment,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
        |count(*) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey GROUP BY c_mktsegment""".stripMargin,
    // identical semantics to q_join_inner — the bucketed layout changes
    // the PLAN, never the answer, and this gate proves it
    "q_join_inner_bucketed" ->
      """SELECT c_mktsegment,
        |CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
        |count(*) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey GROUP BY c_mktsegment""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
        |coalesce(sum(o_totalprice), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment""".stripMargin,
    "q_join_semi_anti" ->
      """SELECT 'has_order' AS tag, c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_order' AS tag, c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_join_theta" ->
      """SELECT p_brand, count(*) AS n_matches, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity < p_size
        |GROUP BY p_brand""".stripMargin,
    "q_setops" ->
      """SELECT 'u' AS op, custkey FROM (SELECT o_custkey AS custkey FROM orders
        |UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t1
        |UNION ALL
        |SELECT 'i' AS op, custkey FROM (SELECT o_custkey AS custkey FROM orders
        |INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t2
        |UNION ALL
        |SELECT 'e' AS op, custkey FROM (SELECT c_custkey AS custkey FROM customer
        |WHERE c_acctbal > 5000 EXCEPT SELECT o_custkey FROM orders) t3""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
        |sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_n,
        |sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,
    "q_sql" -> graft.ops.Relational.SqlQText,
    "q_grouping_sets" -> graft.ops.Relational.GroupingSetsQText,
    "q_array" ->
      """SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS first_dim,
        |CAST(len(embedding) AS BIGINT) AS dim,
        |CAST(list_max(embedding) AS DOUBLE) AS max_dim,
        |CAST(list_min(embedding) AS DOUBLE) AS min_dim FROM embeddings""".stripMargin,
    // winsorize: cutoffs rounded to 6 dp BEFORE clipping so the
    // DECIMAL cast is exact on both the raw 2-dp prices and the cutoff
    "q_winsorize" ->
      """WITH c AS (SELECT l_returnflag,
        |round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
        |round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
        |FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, count(*) AS n,
        |CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |round(CAST(sum(CAST(greatest(lo, least(hi, l_extendedprice)) AS DECIMAL(20,6))) AS DOUBLE)
        |/ count(*), 6) AS w_mean
        |FROM lineitem l JOIN c USING (l_returnflag) GROUP BY l.l_returnflag""".stripMargin,
    "q_quantile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
        |quantile_cont(l_quantity, 0.95) AS p95_qty,
        |quantile_cont(l_extendedprice, 0.5) AS median_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_map" ->
      """SELECT key, count(*) AS n,
        |CAST(sum(CAST(json_extract_string(props, '$.' || key) AS INT)) AS BIGINT) AS sum_val
        |FROM (SELECT unnest(json_keys(props)) AS key, props FROM events) t
        |GROUP BY key""".stripMargin,
    "q_window_rank" ->
      """SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn,
        |sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spent
        |FROM orders) t WHERE rn <= 3""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price,
        |lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_price,
        |avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3_price,
        |CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS quartile,
        |first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_order
        |FROM orders""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) OVER w AS DOUBLE) AS sum_30d,
        |CAST(count(*) OVER w AS BIGINT) AS n_30d
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
        |date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
        |FROM orders) o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_day
        |RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin,
    // q_source_orc's oracle reads the PARQUET lineitem — the round-trip
    // through ORC must be value-exact, which is exactly the gate
    "q_source_orc" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    // text-format round-trips: oracles read the PARQUET tables — the
    // CSV/JSONL copies must be value-exact, which is the gate
    "q_source_csv" ->
      """SELECT l_linestatus, count(*) AS n_items,
        |CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus""".stripMargin,
    "q_source_jsonl" ->
      """SELECT source, count(*) AS n_docs,
        |CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |max(doc_id) AS max_doc_id FROM documents GROUP BY source""".stripMargin,
    "q_profile" -> ProfileOracleSql,
    // sketch-profile gates: the exact profile text plus the HLL law
    // boolean (both gated forms emit exact lanes + nd_ok)
    "q_profile_approx" ->
      s"SELECT *, TRUE AS nd_ok FROM ($ProfileOracleSql) p",
    "q_profile_incr" ->
      s"SELECT *, TRUE AS nd_ok FROM ($ProfileOracleSql) p",
    "q_stats_agg" ->
      """SELECT l_returnflag, corr(l_quantity, l_extendedprice) AS corr_qty_price,
        |covar_samp(l_quantity, l_extendedprice) AS covar_qty_price,
        |stddev_samp(l_quantity) AS sd_qty, stddev_samp(l_extendedprice) AS sd_price,
        |var_samp(l_quantity) AS var_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10""".stripMargin,
    "q_scalar" ->
      """SELECT p_partkey, upper(substring(p_name, 1, 8)) AS name_prefix,
        |CAST(length(p_name) AS BIGINT) AS name_len,
        |concat_ws('/', p_brand, p_type) AS brand_type,
        |regexp_replace(p_name, 'a', '_', 'g') AS name_sub,
        |abs(p_retailprice - 1000.0) AS price_dist,
        |CAST(floor(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
        |p_partkey % 7 AS key_mod
        |FROM part WHERE p_type LIKE '%BRASS%' OR p_size < 15""".stripMargin,
    "q_json" ->
      """SELECT k, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT CAST(props->>'$.k' AS INT) AS k FROM events) t GROUP BY k""".stripMargin,
    "q_date" ->
      """SELECT y, m, month_start, count(*) AS n_orders, min(d) AS first_day, max(d) AS last_day
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
        |CAST(day(o_orderdate) AS BIGINT) AS d, date_trunc('month', o_orderdate) AS month_start
        |FROM orders) t GROUP BY y, m, month_start""".stripMargin,
    "q_win_tumble" ->
      """SELECT CAST(floor(epoch_us(ts)/30000000) AS BIGINT)*30 + 30 AS win_end, event_type,
        |count(*) AS cnt FROM events GROUP BY 1, 2""".stripMargin,
    "q_win_slide_topn" ->
      """WITH counts AS (
        |SELECT (CAST(floor(epoch_us(ts)/300000000) AS BIGINT) - g)*300 + 3600 AS win_end,
        |user_id, count(*) AS cnt
        |FROM events CROSS JOIN (SELECT unnest(range(0,12)) AS g) gs
        |WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT * FROM (SELECT win_end, user_id, cnt,
        |CAST(row_number() OVER (PARTITION BY win_end ORDER BY cnt DESC, user_id ASC) AS BIGINT) AS rnk
        |FROM counts) t WHERE rnk <= 3""".stripMargin,
    "q_win_session" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS tus,
        |lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS pus FROM events),
        |g AS (SELECT user_id, tus, sum(CASE WHEN pus IS NULL OR tus - pus >= 43200000000 THEN 1 ELSE 0 END)
        |OVER (PARTITION BY user_id ORDER BY tus ROWS UNBOUNDED PRECEDING) AS sid FROM l)
        |SELECT user_id, min(tus) AS session_start_us, max(tus) + 43200000000 AS session_end_us,
        |count(*) AS n_events FROM g GROUP BY user_id, sid""".stripMargin,
    "q_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
        |FROM (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_hash
        |FROM documents) t GROUP BY norm_hash""".stripMargin,
    "q_dedup_near" ->
      """WITH tok AS (SELECT DISTINCT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |sig AS (SELECT doc_id,
        |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
        |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
        |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
        |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
        |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
        |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
        |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
        |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
        |FROM tok GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM sig
        |UNION ALL SELECT doc_id, 1, h2, h3 FROM sig
        |UNION ALL SELECT doc_id, 2, h4, h5 FROM sig
        |UNION ALL SELECT doc_id, 3, h6, h7 FROM sig),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a
        |JOIN bands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
        |AND a.doc_id < b.doc_id),
        |tokh AS (SELECT DISTINCT doc_id,
        |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) AS th FROM tok),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM tokh GROUP BY doc_id),
        |common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM cand c
        |JOIN tokh ta ON ta.doc_id = c.doc_a
        |JOIN tokh tb ON tb.doc_id = c.doc_b AND tb.th = ta.th
        |GROUP BY c.doc_a, c.doc_b)
        |SELECT c.doc_a, c.doc_b,
        |CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) AS jaccard
        |FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
        |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) >= 0.5""".stripMargin,
    // Leak audit: the q_dedup_near pairs pipeline joined to the naive
    // hash split and to the NEAR-dup-cluster split (the cluster oracle
    // nested as a CTE, the q_dedup_best precedent); the cluster row's
    // zero cross count is the by-construction law the audit proves.
    "q_split_leak_audit" ->
      s"""WITH tok AS (SELECT DISTINCT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |sig AS (SELECT doc_id,
        |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
        |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
        |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
        |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
        |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
        |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
        |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
        |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
        |FROM tok GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM sig
        |UNION ALL SELECT doc_id, 1, h2, h3 FROM sig
        |UNION ALL SELECT doc_id, 2, h4, h5 FROM sig
        |UNION ALL SELECT doc_id, 3, h6, h7 FROM sig),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a
        |JOIN bands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
        |AND a.doc_id < b.doc_id),
        |tokh AS (SELECT DISTINCT doc_id,
        |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) AS th FROM tok),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM tokh GROUP BY doc_id),
        |common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM cand c
        |JOIN tokh ta ON ta.doc_id = c.doc_a
        |JOIN tokh tb ON tb.doc_id = c.doc_b AND tb.th = ta.th
        |GROUP BY c.doc_a, c.doc_b),
        |pairs AS (SELECT c.doc_a, c.doc_b
        |FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a
        |JOIN sizes sb ON sb.doc_id = c.doc_b
        |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) >= 0.5),
        |nv AS (SELECT doc_id, CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid'
        |ELSE 'test' END AS s FROM (SELECT doc_id,
        |CAST(('0x'||substr(md5('split:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
        |FROM documents) z),
        |cl AS (
        |${dupClusterOracleSql(docsCte = "", src = "documents")}
        |),
        |cs AS (SELECT doc_id, CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid'
        |ELSE 'test' END AS s FROM (SELECT d.doc_id,
        |CAST(('0x'||substr(md5('split:' || CAST(coalesce(c.cluster, d.doc_id) AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
        |FROM documents d LEFT JOIN cl c ON c.doc_id = d.doc_id) z),
        |a1 AS (SELECT 'naive_hash' AS scheme, count(*) AS n_pairs,
        |CAST(sum(CASE WHEN na.s <> nb.s THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
        |FROM pairs p JOIN nv na ON na.doc_id = p.doc_a JOIN nv nb ON nb.doc_id = p.doc_b),
        |a2 AS (SELECT 'cluster' AS scheme, count(*) AS n_pairs,
        |CAST(sum(CASE WHEN la.s <> lb.s THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
        |FROM pairs p JOIN cs la ON la.doc_id = p.doc_a JOIN cs lb ON lb.doc_id = p.doc_b)
        |SELECT scheme, n_pairs, n_cross,
        |round(CAST(n_cross AS DOUBLE)/nullif(n_pairs, 0), 6) AS leak_rate FROM a1
        |UNION ALL SELECT scheme, n_pairs, n_cross,
        |round(CAST(n_cross AS DOUBLE)/nullif(n_pairs, 0), 6) AS leak_rate FROM a2""".stripMargin,
    // The minhash estimator readout: the q_dedup_near pipeline's pairs
    // enriched with the signature-agreement estimate (exact multiples
    // of 1/8 in both engines) and its absolute error.
    "q_minhash_est" ->
      """WITH tok AS (SELECT DISTINCT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |sig AS (SELECT doc_id,
        |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
        |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
        |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
        |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
        |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
        |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
        |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
        |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
        |FROM tok GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM sig
        |UNION ALL SELECT doc_id, 1, h2, h3 FROM sig
        |UNION ALL SELECT doc_id, 2, h4, h5 FROM sig
        |UNION ALL SELECT doc_id, 3, h6, h7 FROM sig),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a
        |JOIN bands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
        |AND a.doc_id < b.doc_id),
        |tokh AS (SELECT DISTINCT doc_id,
        |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) AS th FROM tok),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM tokh GROUP BY doc_id),
        |common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common FROM cand c
        |JOIN tokh ta ON ta.doc_id = c.doc_a
        |JOIN tokh tb ON tb.doc_id = c.doc_b AND tb.th = ta.th
        |GROUP BY c.doc_a, c.doc_b),
        |pairs AS (SELECT c.doc_a, c.doc_b,
        |CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) AS jaccard
        |FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
        |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_tok + sb.n_tok - c.n_common) >= 0.5)
        |SELECT p.doc_a, p.doc_b, round(p.jaccard, 6) AS jaccard,
        |(CAST(a.h0 = b.h0 AS INT) + CAST(a.h1 = b.h1 AS INT)
        |+ CAST(a.h2 = b.h2 AS INT) + CAST(a.h3 = b.h3 AS INT)
        |+ CAST(a.h4 = b.h4 AS INT) + CAST(a.h5 = b.h5 AS INT)
        |+ CAST(a.h6 = b.h6 AS INT) + CAST(a.h7 = b.h7 AS INT)) / 8.0 AS est_jaccard,
        |round(abs((CAST(a.h0 = b.h0 AS INT) + CAST(a.h1 = b.h1 AS INT)
        |+ CAST(a.h2 = b.h2 AS INT) + CAST(a.h3 = b.h3 AS INT)
        |+ CAST(a.h4 = b.h4 AS INT) + CAST(a.h5 = b.h5 AS INT)
        |+ CAST(a.h6 = b.h6 AS INT) + CAST(a.h7 = b.h7 AS INT)) / 8.0 - p.jaccard), 6) AS abs_err
        |FROM pairs p JOIN sig a ON a.doc_id = p.doc_a
        |JOIN sig b ON b.doc_id = p.doc_b""".stripMargin,
    // Cluster resolution over the SAME pair pipeline as q_dedup_near.
    // Shape matters for DuckDB feasibility: a naive recursive
    // reachability walk does Σ|component|²·degree join work — cubic in
    // clique size, and the sf0.1 corpus contains a ~4000-doc template
    // clique (7.8M pairs). So the oracle mirrors the Spark algorithm:
    // two STAR-CONTRACTION levels in plain SQL (each node merges into
    // the min of its closed neighborhood; a clique collapses in one
    // level — measured 7.8M → 3276 → 58 edges at sf0.1) and only the
    // residual sparse graph enters the recursive min-label walk, whose
    // per-row prune (label < receiving node) keeps it linear-ish. The
    // component minimum survives contraction (the min's own
    // neighborhood-min is itself), so labels are exact. The walk sits
    // in a NESTED subquery because DuckDB 1.0 stops honoring
    // MATERIALIZED once the top-level WITH is RECURSIVE — inlining it
    // re-evaluates the md5 pair pipeline per reference (measured 3×).
    "q_dup_clusters" -> dupClusterOracleSql(docsCte = "", src = "documents"),
    // the cluster oracle nested as a CTE, then the keep-longest rank —
    // quality-aware canonical selection shares the clustering ground truth
    "q_dedup_best" ->
      s"""WITH clusters AS (
        |${dupClusterOracleSql(docsCte = "", src = "documents")}
        |)
        |SELECT cluster, doc_id, n_chars, (rn = 1) AS keep FROM (
        |SELECT c.cluster, c.doc_id, d.n_chars,
        |row_number() OVER (PARTITION BY c.cluster
        |ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
        |FROM clusters c JOIN documents d ON d.doc_id = c.doc_id) t""".stripMargin,
    // batch re-clustering of the re-keyed corpus ∪ delta union — the
    // ground truth the INCREMENTAL label maintenance must reproduce
    "q_dup_clusters_incr" -> dupClusterOracleSql(
      docsCte = """docs2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
        |UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |""".stripMargin,
      src = "docs2"),
    // Incremental shape: same banded minhash + exact-Jaccard as
    // q_dedup_near, over the corpus (doc_id % 20 <> 0) ∪ re-keyed delta
    // (doc_id % 20 = 0, +100000), restricted to (delta, corpus) cross
    // pairs — exactly what the persisted-index path must return.
    "q_dedup_incr" -> nearDupIncrOracleSql(""),
    // deletion propagation on the LSH store: the delta lookup after
    // forgetting doc_id % 13 = 0 equals the batch pairs against the
    // surviving corpus
    "q_dedup_forget" -> nearDupIncrOracleSql(" AND b.doc_id % 13 <> 0"),
    // The incremental fuzzy shape: q_dedup_incr's banded blocking over
    // corpus ∪ re-keyed delta, restricted to (delta, corpus) pairs, with
    // the edit-distance verify of q_dedup_fuzzy.
    "q_dedup_fuzzy_incr" ->
      """WITH docs2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
        |UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |tok AS (SELECT DISTINCT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM docs2) u WHERE t <> ''),
        |sig AS (SELECT doc_id,
        |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
        |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
        |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
        |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
        |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
        |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
        |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
        |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
        |FROM tok GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM sig
        |UNION ALL SELECT doc_id, 1, h2, h3 FROM sig
        |UNION ALL SELECT doc_id, 2, h4, h5 FROM sig
        |UNION ALL SELECT doc_id, 3, h6, h7 FROM sig),
        |delta_ids AS (SELECT doc_id + 100000 AS doc_id FROM documents WHERE doc_id % 20 = 0),
        |cand AS (SELECT DISTINCT a.doc_id AS probe_id, b.doc_id AS match_id FROM bands a
        |JOIN bands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
        |WHERE a.doc_id IN (SELECT doc_id FROM delta_ids)
        |AND b.doc_id NOT IN (SELECT doc_id FROM delta_ids)),
        |norm AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |FROM docs2),
        |v AS (SELECT probe_id, match_id,
        |CAST(levenshtein(na.t, nb.t) AS BIGINT) AS edit_dist,
        |greatest(length(na.t), length(nb.t)) AS max_len
        |FROM cand JOIN norm na ON na.doc_id = probe_id JOIN norm nb ON nb.doc_id = match_id)
        |SELECT probe_id, match_id, edit_dist,
        |CASE WHEN max_len = 0 THEN 1.0 ELSE 1.0 - CAST(edit_dist AS DOUBLE)/max_len END AS edit_sim
        |FROM v
        |WHERE CASE WHEN max_len = 0 THEN 1.0 ELSE 1.0 - CAST(edit_dist AS DOUBLE)/max_len END >= 0.8""".stripMargin,
    "q_dedup_simhash" ->
      """WITH tok AS (SELECT DISTINCT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |bits AS (SELECT doc_id, j,
        |sum(CASE WHEN (CAST(('0x'||substr(md5(token),1,8)) AS BIGINT) >> j) & 1 = 1
        |THEN 1 ELSE -1 END) AS s
        |FROM tok CROSS JOIN (SELECT unnest(range(0,32)) AS j) js GROUP BY doc_id, j),
        |fp AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash
        |FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "q_dedup_ngram" ->
      """WITH sh AS (SELECT DISTINCT doc_id,
        |unnest(list_transform(range(0, greatest(len(toks)-2, 0)),
        |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+3], ' ')),1,15)) AS BIGINT))) AS shingle
        |FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents) t WHERE len(toks) >= 3),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50),
        |shf AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT c.doc_a, c.doc_b,
        |CAST(c.n_common AS DOUBLE)/(sa.n_sh + sb.n_sh - c.n_common) AS jaccard
        |FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
        |WHERE CAST(c.n_common AS DOUBLE)/(sa.n_sh + sb.n_sh - c.n_common) >= 0.3""".stripMargin,
    // same shingle lane, asymmetric measure: |∩| / min(|A|, |B|) ≥ 0.6
    "q_dedup_containment" ->
      """WITH sh AS (SELECT DISTINCT doc_id,
        |unnest(list_transform(range(0, greatest(len(toks)-2, 0)),
        |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+3], ' ')),1,15)) AS BIGINT))) AS shingle
        |FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents) t WHERE len(toks) >= 3),
        |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50),
        |shf AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT c.doc_a, c.doc_b,
        |CAST(c.n_common AS DOUBLE)/least(sa.n_sh, sb.n_sh) AS containment
        |FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
        |WHERE CAST(c.n_common AS DOUBLE)/least(sa.n_sh, sb.n_sh) >= 0.6""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, list_aggregate(list_transform(range(0, greatest(len(toks)-5, 0)+1),
        |i -> md5(array_to_string(toks[i+1:i+5], ' '))), 'min') AS fp
        |FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents) t""".stripMargin,
    "q_multimodal" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |md5(text) AS payload_md5,
        |CAST(doc_id % 640 + 64 AS BIGINT) AS width,
        |CAST(doc_id % 480 + 48 AS BIGINT) AS height,
        |substr(hex(encode(text)), 1, 16) AS frame_0,
        |substr(hex(encode(text)), 17, 16) AS frame_1,
        |substr(hex(encode(text)), 33, 16) AS frame_2
        |FROM documents""".stripMargin,
    // Perceptual dedup: 60-bit dHash over the decoded (stub: code-point)
    // sequence of each payload and its one-byte-corrupted re-encode
    // variant (doc_id + 100000); full O(n^2) pairwise scan at hamming
    // <= 3 — the banded join must equal it exactly (pigeonhole).
    "q_image_dedup" -> imageOracleSql(""),
    // Video frame dedup: same variant synthesis and dHash sampling
    // formula as the image oracle, applied per fixed-stride frame;
    // df cap 2..50 and the >= 3 shared-frame bar are declared semantics.
    // ASCII-payload contract (same as the image oracle): the oracle
    // samples code points (DuckDB unicode()) where the engine's native
    // DHash60 records Spark ascii() semantics (signed first UTF-8 byte)
    // — they agree exactly on ASCII payloads, which the documents
    // fixture guarantees; a multibyte corpus would need the oracle to
    // sample the first byte of the character instead.
    "q_video_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE length(text) >= 16),
        |v AS (SELECT doc_id + 100000 AS doc_id,
        |substr(text, 1, greatest(1, CAST(floor(length(text)/2) AS INT)) - 1) || '~' ||
        |substr(text, greatest(1, CAST(floor(length(text)/2) AS INT)) + 1, length(text)) AS text
        |FROM base),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM v),
        |fr AS (SELECT doc_id, substr(text, CAST(i*12 + 1 AS INT), 16) AS frame
        |FROM (SELECT doc_id, text, unnest(range(0,
        |1 + CAST(floor((length(text) - 16) / 12.0) AS BIGINT))) AS i
        |FROM u WHERE length(text) >= 16) z),
        |c AS (SELECT doc_id, frame, list_transform(range(0, 61), i ->
        |unicode(substr(frame, CAST(floor(i*(length(frame)-1)/60) AS INT) + 1, 1))) AS cs
        |FROM fr),
        |f AS (SELECT DISTINCT doc_id, CAST(list_sum(list_transform(range(0, 60), j ->
        |CASE WHEN cs[j+1] < cs[j+2] THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT) AS fp
        |FROM c),
        |sz AS (SELECT fp, count(DISTINCT doc_id) AS df FROM f GROUP BY fp),
        |p AS (SELECT a.doc_id AS vid_a, b.doc_id AS vid_b, count(*) AS n_shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |JOIN sz ON sz.fp = a.fp AND sz.df BETWEEN 2 AND 50
        |GROUP BY 1, 2)
        |SELECT vid_a, vid_b, CAST(n_shared AS BIGINT) AS n_shared
        |FROM p WHERE n_shared >= 3""".stripMargin,
    // Audio chroma dedup: per-window band-energy difference bits over
    // the stub-decoded sample stream (windows of 32 at hop 16, 8 bands
    // of 4 — band width divides the hop, so every band energy is one of
    // the non-overlapping 4-sample partial sums b4; window t>=1 bits:
    // 7 spectral E(t,b)>E(t,b+1) + 8 temporal E(t,b)>E(t-1,b)), same
    // variant synthesis, df cap and >= 3 shared bar as the video
    // oracle. ASCII-payload contract as image/video (unicode vs ascii).
    "q_audio_dedup" -> audioOracleSql(""),
    // delta-vs-index contract: only (indexed base, incoming variant)
    // pairs; the df cap is computed over the same base+variant union
    // as the batch form (the pruned buckets see complete posting
    // lists, so the engine's df is exact — see audioNearDupsAgainstIndex)
    "q_audio_dedup_incr" ->
      audioOracleSql("AND a.doc_id < 100000 AND b.doc_id >= 100000"),
    // the incremental lookup's oracle is the SAME pairwise text
    // restricted to (indexed base, delta variant) pairs — exactly the
    // delta-vs-index contract the pruned lookup computes
    "q_image_dedup_incr" -> imageOracleSql(
      "AND a.doc_id < 100000 AND b.doc_id >= 100000"),
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens, avg(n_chars) AS avg_chars,
        |max(n_tok) AS max_tokens
        |FROM (SELECT lang,
        |CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok,
        |CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
        |CAST(length(text) AS BIGINT) AS n_chars FROM documents) t GROUP BY lang""".stripMargin,
    "q_corpus_report" -> CorpusReportOracleSql,
    // the incremental form reads the persisted additive index over the
    // same full corpus — the SAME report text is its ground truth
    "q_corpus_report_incr" -> CorpusReportOracleSql,
    // deletion propagation on the data card: the index after forgetting
    // doc_id % 17 = 0 must equal the survivor-corpus batch report
    "q_corpus_report_forget" ->
      corpusReportOracleSqlOver("WHERE doc_id % 17 <> 0"),
    // replay of the additive histogram enclosure: same floor(v/16)
    // buckets, same rank bracketing — additivity makes the full-table
    // replay the incremental read's ground truth
    "q_quantile_incr" ->
      """WITH m AS (SELECT 'l_quantity' AS column_name, CAST(l_quantity AS DOUBLE) AS v
        |FROM lineitem WHERE l_quantity IS NOT NULL
        |UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
        |FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |h AS (SELECT column_name, CAST(floor(v / 16.0) AS BIGINT) AS bucket,
        |CAST(count(*) AS BIGINT) AS c, min(v) AS lo, max(v) AS hi
        |FROM m GROUP BY 1, 2),
        |cum AS (SELECT column_name, bucket, c, lo, hi,
        |CAST(sum(c) OVER (PARTITION BY column_name ORDER BY bucket) AS BIGINT) AS cum_le,
        |CAST(sum(c) OVER (PARTITION BY column_name) AS BIGINT) AS n FROM h),
        |ps AS (SELECT unnest([0.5, 0.95]) AS p),
        |pos AS (SELECT c2.column_name, ps.p, c2.n,
        |CAST(floor(ps.p * (c2.n - 1)) AS BIGINT) AS rk_lo,
        |CAST(ceil(ps.p * (c2.n - 1)) AS BIGINT) AS rk_hi
        |FROM (SELECT DISTINCT column_name, n FROM cum) c2 CROSS JOIN ps)
        |SELECT pos.column_name, pos.p, pos.n AS n_rows,
        |bl.lo AS v_lo, bh.hi AS v_hi
        |FROM pos
        |JOIN cum bl ON bl.column_name = pos.column_name
        |AND bl.cum_le - bl.c <= pos.rk_lo AND pos.rk_lo < bl.cum_le
        |JOIN cum bh ON bh.column_name = pos.column_name
        |AND bh.cum_le - bh.c <= pos.rk_hi AND pos.rk_hi < bh.cum_le""".stripMargin,
    "q_cms_topk" -> CmsOracleSql,
    // the incremental form folds the persisted partial counters over the
    // same full corpus — additivity makes the SAME sketch its ground truth
    "q_cms_incr" -> CmsOracleSql,
    "q_bpe_merges" -> bpeOracleSql(6),
    // unigram train/encode: the oracle re-runs seed -> 2 x (Viterbi
    // E-step + prune) -- the Viterbi as a window-carried recursive CTE
    // (dp for the last 4 positions rides the row; the best transition
    // is a struct list_sort on the declared (pieces, -utility, -len)
    // total order), per-round MATERIALIZED CTEs like the BPE chain
    "q_unigram_train" -> unigramOracleSql(
      s"SELECT piece, u AS utility, CAST(length(piece) AS BIGINT) AS n_chars FROM v$UnigramRounds"),
    "q_unigram_encode" -> {
      val sFinal = UnigramRounds + 1
      unigramOracleSql(
        s"""SELECT word, n, CAST(len(sg) AS BIGINT) AS n_piece,
          |array_to_string(sg, ' ') AS pieces FROM s$sFinal""".stripMargin,
        encodeTail = true)
    },
    // persisted-model encode ≡ batch train-and-encode (deterministic
    // train) — the SAME oracle text, the q_corpus_report_incr
    // shared-oracle convention
    "q_unigram_encode_incr" -> {
      val sFinal = UnigramRounds + 1
      unigramOracleSql(
        s"""SELECT word, n, CAST(len(sg) AS BIGINT) AS n_piece,
          |array_to_string(sg, ' ') AS pieces FROM s$sFinal""".stripMargin,
        encodeTail = true)
    },
    // the apply side: the final segmentation table the train built
    "q_bpe_encode" -> bpeOracleSql(6,
      """SELECT word, n, CAST(len(sym) AS BIGINT) AS n_sym,
        |array_to_string(sym, ' ') AS bpe FROM seg6""".stripMargin),
    // End-to-end export: the BPE train chain (seg6) feeds per-doc
    // encoded lengths, packed with q_pack's exact shard/order/prefix
    // spelling on enc_len. The leading comma CONTINUES the generated
    // WITH chain.
    // the end-to-end pipeline: the generated BPE chain extended with
    // the clean-verdict, near-dup, excision and pack tails (see
    // e2eCorpusOracleTail) — every stage text reused from its own gate
    "q_e2e_corpus" -> bpeOracleSql(6, e2eCorpusOracleTail),
    // per-source word stream joined to the seg6 encode table; ratios
    // are single divisions of exact BIGINT sums, 6 dp
    "q_tokenizer_fertility" -> bpeOracleSql(6,
      """,enc AS (SELECT word, CAST(len(sym) AS BIGINT) AS n_sym FROM seg6),
        |dw AS (SELECT source, t AS word FROM
        |(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> '')
        |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
        |CAST(sum(n_sym) AS BIGINT) AS n_tokens,
        |CAST(sum(length(word)) AS BIGINT) AS n_chars,
        |round(CAST(sum(n_sym) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS fertility,
        |round(CAST(sum(length(word)) AS DOUBLE) / CAST(sum(n_sym) AS DOUBLE), 6) AS chars_per_token
        |FROM dw JOIN enc USING (word) GROUP BY source""".stripMargin),
    // the steady-state replay: delta-only report, base-trained
    // tokenizer, near-dup over the union with the incremental victim
    // rule, grams over base + keepers
    "q_e2e_corpus_incr" -> bpeOracleSql(6, e2eCorpusIncrOracleTail,
      "WHERE doc_id >= 50 AND doc_id % 20 <> 0"),
    "q_tokenize_pack" -> bpeOracleSql(6,
      """,enc AS (SELECT word, CAST(len(sym) AS BIGINT) AS n_sym FROM seg6),
        |dt AS (SELECT doc_id, t AS word FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |dl AS (SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS enc_len
        |FROM dt JOIN enc USING (word) GROUP BY doc_id),
        |sh AS (SELECT doc_id,
        |CAST(('0x'||substr(md5('shard:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 16 AS shard,
        |CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS ok,
        |enc_len FROM dl),
        |c AS (SELECT shard, doc_id, enc_len,
        |sum(enc_len) OVER (PARTITION BY shard ORDER BY ok ASC, doc_id ASC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sh)
        |SELECT shard, count(*) AS n_docs, CAST(sum(enc_len) AS BIGINT) AS total_enc_tokens,
        |CAST(count(DISTINCT CAST(floor((cum - enc_len) / 512.0) AS BIGINT)) AS BIGINT) AS n_seqs,
        |CAST(max(CAST(floor((cum - enc_len) / 512.0) AS BIGINT)) AS BIGINT) AS last_seq
        |FROM c GROUP BY shard""".stripMargin),
    // Gopher doc-level battery: every threshold in integer
    // cross-multiplied form, so the flags are exact in any engine
    "q_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text,
        |list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tk
        |FROM documents),
        |b AS (SELECT doc_id,
        |CAST(len(tk) AS BIGINT) AS n_words,
        |CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS sum_word_len,
        |CAST((length(text) - length(replace(text, '...', ''))) // 3
        |+ (length(text) - length(replace(text, '#', ''))) AS BIGINT) AS n_symbols,
        |CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha_words,
        |CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |s -> list_contains(tk, s))) AS BIGINT) AS n_stop_hits
        |FROM t)
        |SELECT doc_id, n_words, sum_word_len, n_symbols, n_alpha_words, n_stop_hits,
        |CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT) AS r_word_count,
        |CAST(sum_word_len >= 3*n_words AND sum_word_len <= 10*n_words AND n_words > 0 AS BIGINT) AS r_mean_word_len,
        |CAST(10*n_symbols <= n_words AND n_words > 0 AS BIGINT) AS r_symbol_ratio,
        |CAST(5*n_alpha_words >= 4*n_words AND n_words > 0 AS BIGINT) AS r_alpha_words,
        |CAST(n_stop_hits >= 2 AS BIGINT) AS r_stopwords,
        |CAST(r_word_count + r_mean_word_len + r_symbol_ratio
        |+ r_alpha_words + r_stopwords = 5 AS BIGINT) AS keep
        |FROM b""".stripMargin,
    // adjacent-duplicate collapse: keep token i iff first or ≠ token i−1
    "q_collapse_repeats" ->
      """WITH t AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tk
        |FROM documents),
        |u AS (SELECT doc_id, unnest(tk) AS tok, unnest(range(1, len(tk)+1)) AS pos FROM t),
        |k AS (SELECT doc_id, tok, pos,
        |lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM u),
        |kept AS (SELECT doc_id, count(*) AS n_kept,
        |string_agg(tok, ' ' ORDER BY pos) AS clean_text
        |FROM k WHERE prev IS NULL OR tok <> prev GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
        |CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
        |coalesce(kept.clean_text, '') AS clean_text
        |FROM t LEFT JOIN kept ON kept.doc_id = t.doc_id""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, CAST(n_tok AS BIGINT) AS n_tokens,
        |CAST(length(text) AS DOUBLE)/n_tok AS avg_tok_len,
        |CAST(punct AS DOUBLE)/nullif(length(text), 0) AS punct_ratio,
        |CAST(stop_hits AS DOUBLE)/n_tok AS stopword_ratio,
        |CAST((n_tok >= 10 AND CAST(punct AS DOUBLE)/nullif(length(text), 0) < 0.3
        |AND CAST(stop_hits AS DOUBLE)/n_tok > 0.01) AS BIGINT) AS keep
        |FROM (SELECT doc_id, text,
        |len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok,
        |len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS punct,
        |len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x IN ('the','a','an','and','of','to','in','is','on','for'))) AS stop_hits
        |FROM documents) t""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents),
        |m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |CASE WHEN len(toks) >= 2 THEN 1.0 -
        |CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
        |/ (len(toks) - 1) ELSE 0.0 END AS dup_2gram_frac,
        |CASE WHEN len(toks) >= 3 THEN 1.0 -
        |CAST(len(list_distinct(list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE)
        |/ (len(toks) - 2) ELSE 0.0 END AS dup_3gram_frac FROM t),
        |tc AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_nonempty FROM (
        |SELECT doc_id, tok, count(*) AS c FROM (SELECT doc_id, unnest(toks) AS tok FROM t) u
        |WHERE tok <> '' GROUP BY doc_id, tok) g GROUP BY doc_id)
        |SELECT m.doc_id, n_tokens, CAST(top_c AS DOUBLE)/n_nonempty AS top_token_frac,
        |dup_2gram_frac, dup_3gram_frac,
        |CAST((CAST(top_c AS DOUBLE)/n_nonempty < 0.2 AND dup_2gram_frac < 0.2) AS BIGINT) AS keep
        |FROM m JOIN tc ON tc.doc_id = m.doc_id""".stripMargin,
    "q_lang_id" ->
      """SELECT lang, pred_lang, count(*) AS n FROM (SELECT lang,
        |CASE WHEN CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x IN ('the','a','an','and','of','to','in','is','on','for'))) AS DOUBLE)
        |/ len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 0.05
        |THEN 'en' ELSE 'unknown' END AS pred_lang FROM documents) t
        |GROUP BY lang, pred_lang""".stripMargin,
    "q_top_tokens" ->
      """SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |FROM documents) t
        |WHERE token <> '' GROUP BY token
        |ORDER BY df_docs DESC, token ASC LIMIT 20""".stripMargin,
    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
        |WHERE doc_id < 20 GROUP BY doc_id, token),
        |dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token)
        |SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
        |tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfx.df) AS tfidf
        |FROM tf JOIN dfx ON tf.token = dfx.token CROSS JOIN n""".stripMargin,
    "q_skew_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS total, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // The bloom prune must be invisible: plain filtered join.
    "q_bloom_join" ->
      """SELECT o_orderpriority, sum(l_quantity) AS total_qty, count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority""".stripMargin,
    // Same deterministic PII synthesis (pure functions of doc_id), same
    // patterns in the same order; 'g' flag = Spark's replace-all default.
    "q_redact" ->
      """WITH aug AS (SELECT doc_id,
        |text || ' contact user' || CAST(doc_id AS VARCHAR)
        ||| '@mail.example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
        ||| '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        ||| ' id ' || CAST(doc_id + 100000000 AS VARCHAR)
        ||| ' phone 555-867-5309' AS t FROM documents)
        |SELECT doc_id,
        |regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |'\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |'\b\d{9,}\b', '<ID>', 'g') AS text,
        |len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
        |len(regexp_extract_all(t, '\b\d{9,}\b')) AS n_id
        |FROM aug""".stripMargin,
    // entity inventory: same augmentation, each pattern extracted
    // independently off the original text, corpus-wide (kind, entity)
    // aggregate
    "q_entities" -> EntitiesOracleSql,
    "q_entities_incr" -> EntitiesOracleSql,
    // GDPR on the PII-bearing index: the inventory after forgetting
    // doc_id % 17 = 0 must equal the survivor-corpus batch scan
    "q_entity_forget" -> entitiesOracleSqlOver("WHERE doc_id % 17 <> 0"),
    "q_entity_lookup" ->
      """WITH aug AS (SELECT doc_id,
        |text || ' contact user' || CAST(doc_id AS VARCHAR)
        ||| '@mail.example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
        ||| '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        ||| ' id ' || CAST(doc_id + 100000000 AS VARCHAR)
        ||| ' phone 555-867-5309' AS t FROM documents),
        |e AS (SELECT doc_id, 'phone' AS kind,
        |unnest(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS entity FROM aug)
        |SELECT doc_id, kind, CAST(count(*) AS BIGINT) AS n_occ
        |FROM e WHERE entity = '555-867-5309' GROUP BY doc_id, kind""".stripMargin,
    // Same deterministic line synthesis (6-token lines, punct on 3/4
    // lines, javascript on every 11th (doc,line), lorem on %37 docs,
    // brace on %41 docs), same rule battery, same verdict precedence.
    "q_c4_filters" ->
      """WITH t AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tk
        |FROM documents),
        |l0 AS (SELECT doc_id,
        |CASE WHEN len(tk) > 0 THEN
        |list_transform(range(0, CAST(ceil(len(tk)/6.0) AS BIGINT)), i ->
        |(CASE WHEN (doc_id*31 + i) % 11 = 0
        |THEN array_to_string(tk[i*6+1 : i*6+6], ' ') || ' javascript'
        |ELSE array_to_string(tk[i*6+1 : i*6+6], ' ') END)
        ||| (CASE WHEN (doc_id + i) % 4 <> 0 THEN '.' ELSE '' END))
        |ELSE CAST([] AS VARCHAR[]) END AS lines0 FROM t),
        |l1 AS (SELECT doc_id, lines0
        ||| (CASE WHEN doc_id % 37 = 0 THEN ['lorem ipsum dolor sit amet.'] ELSE CAST([] AS VARCHAR[]) END)
        ||| (CASE WHEN doc_id % 41 = 0 THEN ['function() { return 0; }.'] ELSE CAST([] AS VARCHAR[]) END) AS lines
        |FROM l0),
        |k AS (SELECT doc_id, lines,
        |list_filter(lines, l -> l LIKE '%.' AND len(string_split(l, ' ')) >= 5
        |AND NOT contains(l, 'javascript')) AS kept FROM l1),
        |r AS (SELECT doc_id,
        |CAST(len(lines) AS BIGINT) AS n_lines,
        |CAST(len(kept) AS BIGINT) AS n_kept_lines,
        |CASE WHEN len(list_filter(lines, l -> contains(l, 'lorem ipsum'))) > 0 THEN 'lorem_ipsum'
        |WHEN len(list_filter(lines, l -> contains(l, '{'))) > 0 THEN 'brace'
        |WHEN len(kept) < 3 THEN 'too_few_lines'
        |ELSE 'keep' END AS reason, kept FROM k)
        |SELECT doc_id, n_lines, n_kept_lines, reason,
        |CAST(reason = 'keep' AS BIGINT) AS keep,
        |CASE WHEN reason = 'keep' THEN array_to_string(kept, ' ') ELSE '' END AS cleaned_text
        |FROM r""".stripMargin,
    // HTML synthesis + extraction, regex-for-regex the engine's spelling
    "q_html_extract" ->
      """WITH t AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tk
        |FROM documents),
        |h AS (SELECT doc_id,
        |'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |'</title><script>var x = ' || CAST(doc_id AS VARCHAR) ||
        |';</script><style>body { color: red; }</style></head><body><div class="nav">home | about | contact</div>' ||
        |(CASE WHEN len(tk) > 0 THEN
        |array_to_string(list_transform(range(0, CAST(ceil(len(tk)/8.0) AS BIGINT)), i ->
        |'<p>' || array_to_string(tk[i*8+1 : i*8+8], ' ') || '</p>'), '')
        |ELSE '' END) ||
        |(CASE WHEN doc_id % 7 = 0 THEN '<!-- tracking beacon ' || CAST(doc_id AS VARCHAR) || ' -->' ELSE '' END) ||
        |(CASE WHEN doc_id % 5 = 0 THEN '<script>analytics.track("' || CAST(doc_id AS VARCHAR) || '");</script>' ELSE '' END) ||
        |'<div class="footer">copyright example corp all rights reserved</div></body></html>' AS html
        |FROM t),
        |e AS (SELECT doc_id, html,
        |regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |'<script[^>]*>.*?</script>', ' ', 'g'),
        |'<style[^>]*>.*?</style>', ' ', 'g'),
        |'<!--.*?-->', ' ', 'g'),
        |'</(p|div|title|h[1-6])>', '@@L@@', 'g'),
        |'<[^>]*>', ' ', 'g') AS flat FROM h),
        |l AS (SELECT doc_id, html,
        |list_transform(string_split(flat, '@@L@@'), s -> trim(regexp_replace(s, '\s+', ' ', 'g'))) AS lines
        |FROM e),
        |k AS (SELECT doc_id, html,
        |list_filter(lines, s -> s <> '') AS nonempty,
        |list_filter(lines, s -> s <> '' AND NOT contains(s, 'copyright')
        |AND NOT contains(s, '|') AND len(string_split(s, ' ')) >= 3) AS kept
        |FROM l)
        |SELECT doc_id, CAST(length(html) AS BIGINT) AS html_chars,
        |CAST(len(nonempty) AS BIGINT) AS n_lines,
        |CAST(len(kept) AS BIGINT) AS n_kept,
        |array_to_string(kept, ' ') AS text_extracted,
        |CAST(length(array_to_string(kept, ' ')) AS BIGINT) AS text_chars
        |FROM k""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderpriority, sum(l_quantity) AS total_qty, count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q_ngram_counts" ->
      """WITH toks AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
        |FROM documents),
        |big AS (SELECT unnest(list_transform(range(1, len(t)),
        |i -> t[i] || ' ' || t[i+1])) AS bigram FROM toks WHERE len(t) >= 2)
        |SELECT bigram, count(*) AS n FROM big GROUP BY bigram
        |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,
    "q_split" ->
      """WITH hashed AS (SELECT doc_id,
        |md5(lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))) AS norm_hash
        |FROM documents),
        |asg AS (SELECT doc_id, norm_hash,
        |CAST(('0x'||substr(md5('split:' || CAST(min(doc_id) OVER (PARTITION BY norm_hash) AS VARCHAR)),1,15)) AS BIGINT) % 100 AS bucket
        |FROM hashed)
        |SELECT CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'valid'
        |ELSE 'test' END AS split, count(*) AS n_docs,
        |CAST(count(DISTINCT norm_hash) AS BIGINT) AS n_clusters
        |FROM asg GROUP BY 1""".stripMargin,
    "q_sample" ->
      """SELECT count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE CAST(('0x'||substr(md5('mix:0:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |% 1000000 < 500000""".stripMargin,
    "q_mixture" ->
      """WITH src0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |src1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
        |mixed AS (
        |SELECT doc_id, text FROM src0
        |UNION ALL SELECT doc_id, text FROM src0
        |UNION ALL SELECT doc_id, text FROM src0
        |WHERE CAST(('0x'||substr(md5('mix:0:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |% 1000000 < 500000
        |UNION ALL SELECT doc_id, text FROM src1
        |WHERE CAST(('0x'||substr(md5('mix:1:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |% 1000000 < 250000)
        |SELECT doc_id % 2 AS src, count(*) AS n_docs,
        |CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM mixed GROUP BY 1""".stripMargin,
    // coalesce(lang, '') mirrors the engine's total assignment rule: a
    // null stratum hashes as '' and draws at the default fraction
    // instead of null-propagating out of the sample entirely
    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE CAST(('0x'||substr(md5('strat:' || coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |% 1000000 < CASE coalesce(lang, '') WHEN 'en' THEN 500000 WHEN 'de' THEN 250000 ELSE 100000 END
        |GROUP BY lang""".stripMargin,
    "q_shard" ->
      """SELECT CAST(('0x'||substr(md5('shard:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 16 AS shard,
        |count(*) AS n_docs,
        |min(CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)) AS first_key,
        |max(CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)) AS last_key,
        |CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1""".stripMargin,
    // Containment semantics: fraction of the TRAINING doc's own distinct
    // 8-gram hashes that occur anywhere in the eval set (docs 0-49).
    // Content-hash CDC: snapshot B = fixture minus doc_id%17==3, with
    // doc_id%17==5 re-crawled (' v2' suffix) and a new page per
    // doc_id%17==7 (id + 300000, synthesized body).
    "q_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
        |b AS (SELECT doc_id,
        |md5(CASE WHEN doc_id % 17 = 5 THEN text || ' v2' ELSE text END) AS h
        |FROM documents WHERE doc_id % 17 <> 3
        |UNION ALL SELECT doc_id + 300000,
        |md5('new snapshot doc ' || CAST(doc_id AS VARCHAR))
        |FROM documents WHERE doc_id % 17 = 7)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |CASE WHEN a.doc_id IS NULL THEN 'added'
        |WHEN b.doc_id IS NULL THEN 'removed'
        |WHEN a.h <> b.h THEN 'changed' ELSE 'unchanged' END AS status
        |FROM a FULL JOIN b ON a.doc_id = b.doc_id""".stripMargin,
    // Exact-k per-stratum sample: the 44-bit salted hash rank order
    // (hash asc, doc_id asc) the bounded-buffer aggregate reproduces.
    "q_sample_k" ->
      """SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id FROM (
        |SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |ORDER BY CAST(('0x'||substr(md5('sk:'||CAST(doc_id AS VARCHAR)),1,11)) AS BIGINT) ASC,
        |doc_id ASC) AS rnk
        |FROM documents WHERE lang IS NOT NULL) t WHERE rnk <= 50""".stripMargin,
    // A-ES weighted draw: key = round(ln(u)/n_chars, 6) with the exact
    // 44-bit hash uniform; top-k per source by key desc, doc_id ties
    "q_sample_weighted" ->
      """WITH t AS (SELECT source, doc_id,
        |round(ln((CAST(('0x'||substr(md5('ws:'||CAST(doc_id AS VARCHAR)),1,11)) AS BIGINT) + 0.5)
        |/ 17592186044416.0) / CAST(n_chars AS DOUBLE), 6) AS key
        |FROM documents WHERE source IS NOT NULL AND n_chars > 0)
        |SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, key + 0.0 AS key FROM (
        |SELECT source, doc_id, key, row_number() OVER (PARTITION BY source
        |ORDER BY key DESC, doc_id ASC) AS rnk FROM t) z WHERE rnk <= 10""".stripMargin,
    // Per-domain cap: rank-window replay of the bounded-buffer top-k
    // (n_chars DESC, doc_id ASC) plus the pre-cap domain volume.
    "q_domain_cap" ->
      """SELECT domain, n_docs, rnk, doc_id, n_chars FROM (
        |SELECT domain, doc_id, n_chars,
        |CAST(row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rnk,
        |CAST(count(*) OVER (PARTITION BY domain) AS BIGINT) AS n_docs
        |FROM (SELECT lower(source) || '.example.com' AS domain, doc_id, n_chars
        |      FROM documents) d) t WHERE rnk <= 3""".stripMargin,
    "q_decontaminate" -> DecontaminateOracleSql,
    // bloom prefilter is a pure pruning layer: SAME oracle text
    "q_decontaminate_bloom" -> DecontaminateOracleSql,

    // Deterministic GPT-style packing: per-shard hash order, prefix-sum
    // token offsets, bin = floor(start / budget). Same md5 shard/order
    // spelling as q_shard.
    "q_pack" ->
      """WITH sh AS (SELECT doc_id,
        |CAST(('0x'||substr(md5('shard:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 16 AS shard,
        |CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS ok,
        |CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok
        |FROM documents),
        |c AS (SELECT shard, doc_id, n_tok,
        |sum(n_tok) OVER (PARTITION BY shard ORDER BY ok ASC, doc_id ASC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sh)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |CAST(count(DISTINCT CAST(floor((cum - n_tok) / 512.0) AS BIGINT)) AS BIGINT) AS n_seqs,
        |CAST(max(CAST(floor((cum - n_tok) / 512.0) AS BIGINT)) AS BIGINT) AS last_seq
        |FROM c GROUP BY shard""".stripMargin,
    // Curriculum order: stopword-ratio tier grid, then the q_shard
    // order hash — the engine's distributed slice prefix sums must
    // equal one global row_number over (tier, ok, doc_id).
    "q_curriculum" ->
      """WITH s AS (SELECT doc_id,
        |CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS ok,
        |regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |t AS (SELECT doc_id, ok, CASE WHEN r >= 0.15 THEN 0
        |WHEN r >= 0.05 THEN 1 ELSE 2 END AS tier FROM
        |(SELECT doc_id, ok, CAST(len(list_filter(tk,
        |x -> list_contains(['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE)
        |/ len(tk) AS r FROM s) z),
        |p AS (SELECT doc_id, CAST(tier AS BIGINT) AS tier,
        |CAST(row_number() OVER (ORDER BY tier, ok, doc_id) - 1 AS BIGINT) AS pos FROM t)
        |SELECT doc_id, tier, pos,
        |CAST(floor(pos / 32.0) AS BIGINT) AS step FROM p""".stripMargin,
    // Token-budget selection: same curriculum order, cumulative token
    // prefix, keep docs whose whole span fits under floor(0.6 * total).
    "q_token_budget" ->
      """WITH s AS (SELECT doc_id,
        |CAST(('0x'||substr(md5('order:' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS ok,
        |regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
        |t AS (SELECT doc_id, ok, CAST(len(tk) AS BIGINT) AS n_tok,
        |CASE WHEN r >= 0.15 THEN 0 WHEN r >= 0.05 THEN 1 ELSE 2 END AS tier FROM
        |(SELECT doc_id, ok, tk, CAST(len(list_filter(tk,
        |x -> list_contains(['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE)
        |/ len(tk) AS r FROM s) z),
        |c AS (SELECT doc_id, tier, n_tok,
        |row_number() OVER (ORDER BY tier, ok, doc_id) - 1 AS pos,
        |sum(n_tok) OVER (ORDER BY tier, ok, doc_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
        |SELECT CAST(tier AS BIGINT) AS tier, count(*) AS n_docs,
        |CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |CAST(max(pos) AS BIGINT) AS last_pos
        |FROM c WHERE cum <= (SELECT CAST(floor(sum(len(tk)) * 0.6) AS BIGINT) FROM s)
        |GROUP BY tier""".stripMargin,
    // Same banded-minhash blocking as q_dedup_near, restricted to the
    // probe set, then byte==char Levenshtein on the ASCII fixture (the
    // engine's code-point semantics vs DuckDB's byte semantics only
    // diverge on non-ASCII text — pinned spec-side instead).
    "q_dedup_fuzzy" ->
      """WITH tok AS (SELECT DISTINCT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |sig AS (SELECT doc_id,
        |min(CAST(('0x'||substr(md5('0:' || token),1,15)) AS BIGINT)) AS h0,
        |min(CAST(('0x'||substr(md5('0:' || token),17,15)) AS BIGINT)) AS h1,
        |min(CAST(('0x'||substr(md5('1:' || token),1,15)) AS BIGINT)) AS h2,
        |min(CAST(('0x'||substr(md5('1:' || token),17,15)) AS BIGINT)) AS h3,
        |min(CAST(('0x'||substr(md5('2:' || token),1,15)) AS BIGINT)) AS h4,
        |min(CAST(('0x'||substr(md5('2:' || token),17,15)) AS BIGINT)) AS h5,
        |min(CAST(('0x'||substr(md5('3:' || token),1,15)) AS BIGINT)) AS h6,
        |min(CAST(('0x'||substr(md5('3:' || token),17,15)) AS BIGINT)) AS h7
        |FROM tok GROUP BY doc_id),
        |bands AS (SELECT doc_id, 0 AS band, h0 AS b0, h1 AS b1 FROM sig
        |UNION ALL SELECT doc_id, 1, h2, h3 FROM sig
        |UNION ALL SELECT doc_id, 2, h4, h5 FROM sig
        |UNION ALL SELECT doc_id, 3, h6, h7 FROM sig),
        |cand AS (SELECT DISTINCT a.doc_id AS probe_id, b.doc_id AS match_id FROM bands a
        |JOIN bands b ON a.band = b.band AND a.b0 = b.b0 AND a.b1 = b.b1
        |AND a.doc_id <> b.doc_id WHERE a.doc_id < 100),
        |norm AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |FROM documents),
        |v AS (SELECT probe_id, match_id,
        |CAST(levenshtein(na.t, nb.t) AS BIGINT) AS edit_dist,
        |greatest(length(na.t), length(nb.t)) AS max_len
        |FROM cand JOIN norm na ON na.doc_id = probe_id JOIN norm nb ON nb.doc_id = match_id)
        |SELECT probe_id, match_id, edit_dist,
        |CASE WHEN max_len = 0 THEN 1.0 ELSE 1.0 - CAST(edit_dist AS DOUBLE)/max_len END AS edit_sim
        |FROM v
        |WHERE CASE WHEN max_len = 0 THEN 1.0 ELSE 1.0 - CAST(edit_dist AS DOUBLE)/max_len END >= 0.8""".stripMargin,
    "q_sim_topk" -> SimTopKOracleSql,
    // the exact brute-force oracle with the label-differs predicate —
    // same dot-product spelling and tie-break as q_sim_topk
    "q_hard_negatives" ->
      """WITH n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM (SELECT vec_id, label,
        |list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings) e WHERE list_dot_product(v, v) > 0),
        |sims AS (SELECT p.vec_id AS anchor_id, CAST(p.label AS BIGINT) AS anchor_label,
        |c.vec_id AS neg_id, CAST(c.label AS BIGINT) AS neg_label,
        |list_dot_product(c.v, p.v)/(c.nrm*p.nrm) AS cos_sim
        |FROM n c JOIN n p ON p.vec_id < 20 AND c.vec_id <> p.vec_id
        |AND c.label <> p.label)
        |SELECT * FROM (SELECT anchor_id, anchor_label, neg_id, neg_label, cos_sim,
        |CAST(row_number() OVER (PARTITION BY anchor_id
        |ORDER BY cos_sim DESC, neg_id ASC) AS BIGINT) AS rnk
        |FROM sims) t WHERE rnk <= 5""".stripMargin,
    // the blocked form: the IVF cell assignment (centroids = vec_id in
    // [20, 36), argmax with the sim-desc/cell-asc tie) recomputed
    // verbatim, then the brute oracle restricted to same-cell pairs
    "q_hard_negatives_ivf" ->
      """WITH n AS (SELECT vec_id, label,
        |list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |nn AS (SELECT vec_id, CAST(label AS BIGINT) AS label, v,
        |sqrt(list_dot_product(v, v)) AS nrm FROM n WHERE list_dot_product(v, v) > 0),
        |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
        |WHERE vec_id >= 20 AND vec_id < 36),
        |asg AS (SELECT vec_id, label, v, nrm, cell FROM (
        |SELECT a.vec_id, a.label, a.v, a.nrm, c.cell,
        |row_number() OVER (PARTITION BY a.vec_id
        |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
        |FROM nn a CROSS JOIN cents c) t WHERE rn = 1),
        |anch AS (SELECT vec_id AS anchor_id, label AS anchor_label,
        |v AS pv, nrm AS pn, cell FROM asg WHERE vec_id < 20),
        |sims AS (SELECT p.anchor_id, p.anchor_label, c.vec_id AS neg_id,
        |c.label AS neg_label,
        |list_dot_product(c.v, p.pv)/(c.nrm*p.pn) AS cos_sim
        |FROM asg c JOIN anch p ON c.cell = p.cell
        |AND c.vec_id <> p.anchor_id AND c.label <> p.anchor_label)
        |SELECT * FROM (SELECT anchor_id, anchor_label, neg_id, neg_label, cos_sim,
        |CAST(row_number() OVER (PARTITION BY anchor_id
        |ORDER BY cos_sim DESC, neg_id ASC) AS BIGINT) AS rnk
        |FROM sims) t WHERE rnk <= 5""".stripMargin,
    // PQ replay: same codebook sampling, argmax encode (dn DESC, cell
    // ASC), nano distance tables, integer ADC sums
    "q_sim_topk_pq" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings),
        |ms AS (SELECT unnest([0,1,2,3]) AS m),
        |cb AS (SELECT m, vec_id AS cell, list_slice(v, m*16+1, m*16+16) AS cv
        |FROM e CROSS JOIN ms WHERE vec_id >= 5 AND vec_id < 13),
        |enc AS (SELECT c.vec_id, cb.m, cb.cell,
        |CAST(floor(list_dot_product(list_slice(c.v, cb.m*16+1, cb.m*16+16), cb.cv) * 1000000.0) AS BIGINT) AS dn
        |FROM e c CROSS JOIN cb),
        |codes AS (SELECT vec_id, m, cell AS code FROM (
        |SELECT vec_id, m, cell, row_number() OVER (PARTITION BY vec_id, m
        |ORDER BY dn DESC, cell ASC) AS rn FROM enc) t WHERE rn = 1),
        |pd AS (SELECT p.vec_id AS probe_id, cb.m, cb.cell AS code,
        |CAST(floor(list_dot_product(list_slice(p.v, cb.m*16+1, cb.m*16+16), cb.cv) * 1000000.0) AS BIGINT) AS qd
        |FROM e p CROSS JOIN cb WHERE p.vec_id < 5),
        |sc AS (SELECT pd.probe_id, c.vec_id AS neighbor_id,
        |CAST(sum(pd.qd) AS BIGINT) AS score_nano
        |FROM codes c JOIN pd ON pd.m = c.m AND pd.code = c.code
        |WHERE c.vec_id <> pd.probe_id GROUP BY 1, 2)
        |SELECT probe_id, neighbor_id, score_nano, rnk FROM (
        |SELECT probe_id, neighbor_id, score_nano,
        |CAST(row_number() OVER (PARTITION BY probe_id
        |ORDER BY score_nano DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |FROM sc) z WHERE rnk <= 5""".stripMargin,
    // IVFADC: the q_sim_topk_pq CTEs + the q_knn_clf_ivf assignment —
    // candidates restricted to the probe's top-2 centroid cells, same
    // ADC integer sums (blocking never changes a score)
    "q_sim_topk_pq_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings),
        |ms AS (SELECT unnest([0,1,2,3]) AS m),
        |cb AS (SELECT m, vec_id AS cell, list_slice(v, m*16+1, m*16+16) AS cv
        |FROM e CROSS JOIN ms WHERE vec_id >= 5 AND vec_id < 13),
        |enc AS (SELECT c.vec_id, cb.m, cb.cell,
        |CAST(floor(list_dot_product(list_slice(c.v, cb.m*16+1, cb.m*16+16), cb.cv) * 1000000.0) AS BIGINT) AS dn
        |FROM e c CROSS JOIN cb),
        |codes AS (SELECT vec_id, m, cell AS code FROM (
        |SELECT vec_id, m, cell, row_number() OVER (PARTITION BY vec_id, m
        |ORDER BY dn DESC, cell ASC) AS rn FROM enc) t WHERE rn = 1),
        |pd AS (SELECT p.vec_id AS probe_id, cb.m, cb.cell AS code,
        |CAST(floor(list_dot_product(list_slice(p.v, cb.m*16+1, cb.m*16+16), cb.cv) * 1000000.0) AS BIGINT) AS qd
        |FROM e p CROSS JOIN cb WHERE p.vec_id < 5),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM e WHERE list_dot_product(v, v) > 0),
        |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
        |WHERE vec_id >= 5 AND vec_id < 21),
        |asg AS (SELECT vec_id, cell FROM (
        |SELECT a.vec_id, c.cell, row_number() OVER (PARTITION BY a.vec_id
        |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
        |FROM nn a CROSS JOIN cents c) t WHERE rn = 1),
        |pcells AS (SELECT probe_id, cell FROM (
        |SELECT p.vec_id AS probe_id, c.cell,
        |row_number() OVER (PARTITION BY p.vec_id
        |ORDER BY list_dot_product(p.v, c.cv)/(p.nrm*c.cn) DESC, c.cell ASC) AS cr
        |FROM nn p CROSS JOIN cents c WHERE p.vec_id < 5) t WHERE cr <= 2),
        |sc AS (SELECT pd.probe_id, c.vec_id AS neighbor_id,
        |CAST(sum(pd.qd) AS BIGINT) AS score_nano
        |FROM codes c JOIN asg a ON a.vec_id = c.vec_id
        |JOIN pcells pc ON pc.cell = a.cell
        |JOIN pd ON pd.m = c.m AND pd.code = c.code AND pd.probe_id = pc.probe_id
        |WHERE c.vec_id <> pd.probe_id GROUP BY 1, 2)
        |SELECT probe_id, neighbor_id, score_nano, rnk FROM (
        |SELECT probe_id, neighbor_id, score_nano,
        |CAST(row_number() OVER (PARTITION BY probe_id
        |ORDER BY score_nano DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |FROM sc) z WHERE rnk <= 5""".stripMargin,
    // kNN label propagation: brute-force top-5 by cosine among the
    // labeled side (vec_id % 10 <> 0), majority vote, ties to the
    // smaller label — same sim/id tie discipline as q_sim_topk
    "q_knn_clf" ->
      """WITH n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings) e WHERE list_dot_product(v, v) > 0),
        |sims AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
        |list_dot_product(c.v, p.v)/(c.nrm*p.nrm) AS cos_sim
        |FROM n c JOIN n p ON p.vec_id % 10 = 0 AND c.vec_id % 10 <> 0),
        |topk AS (SELECT * FROM (SELECT probe_id, label,
        |row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
        |FROM sims) t WHERE rnk <= 5),
        |votes AS (SELECT probe_id, label, count(*) AS n_votes
        |FROM topk GROUP BY probe_id, label)
        |SELECT probe_id AS vec_id, CAST(label AS BIGINT) AS pred_label, n_votes
        |FROM (SELECT probe_id, label, n_votes,
        |row_number() OVER (PARTITION BY probe_id ORDER BY n_votes DESC, label ASC) AS vr
        |FROM votes) v WHERE vr = 1""".stripMargin,
    // cell-pruned kNN: nearest-sampled-centroid assignment (q_cluster's
    // argmax) blocks candidates to the probe's cell; vote text unchanged
    "q_knn_clf_ivf" ->
      """WITH n AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
        |WHERE vec_id >= 5 AND vec_id < 21),
        |asg AS (SELECT vec_id, label, v, nrm, cell FROM (
        |SELECT a.vec_id, a.label, a.v, a.nrm, c.cell,
        |row_number() OVER (PARTITION BY a.vec_id
        |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
        |FROM nn a CROSS JOIN cents c) t WHERE rn = 1),
        |sims AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
        |list_dot_product(c.v, p.v)/(c.nrm*p.nrm) AS cos_sim
        |FROM asg c JOIN asg p ON p.cell = c.cell
        |AND p.vec_id % 10 = 0 AND c.vec_id % 10 <> 0),
        |topk AS (SELECT * FROM (SELECT probe_id, label,
        |row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
        |FROM sims) t WHERE rnk <= 5),
        |votes AS (SELECT probe_id, label, count(*) AS n_votes
        |FROM topk GROUP BY probe_id, label)
        |SELECT probe_id AS vec_id, CAST(label AS BIGINT) AS pred_label, n_votes
        |FROM (SELECT probe_id, label, n_votes,
        |row_number() OVER (PARTITION BY probe_id ORDER BY n_votes DESC, label ASC) AS vr
        |FROM votes) v WHERE vr = 1""".stripMargin,
    // the LSH/IVF variants' blocking is declared semantics, recomputed
    // identically here: sign buckets (as q_embed_neardup), sampled
    // centroids + argmax assignment (as q_cluster), cell-pruned rank
    "q_sim_topk_lsh" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |array_to_string(list_transform(range(8), i -> CASE WHEN v[(i % len(v)) + 1] > 0 THEN '1' ELSE '0' END), '') AS bucket
        |FROM n),
        |probes AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pn, bucket FROM nn WHERE vec_id < 5),
        |sims AS (SELECT p.probe_id, c.vec_id AS neighbor_id,
        |list_dot_product(c.v, p.pv)/(c.nrm*p.pn) AS cos_sim
        |FROM nn c JOIN probes p ON c.bucket = p.bucket AND c.vec_id <> p.probe_id)
        |SELECT * FROM (SELECT probe_id, neighbor_id, cos_sim,
        |CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS rnk
        |FROM sims) t WHERE rnk <= 5""".stripMargin,
    "q_sim_topk_ivf" -> IvfTopKOracleSql,
    // recall@5 of the IVF ranking against the exact one — both CTEs are
    // the two gated operators' own oracle texts, so the audit replays
    // byte-identical ground truth
    "q_ann_recall" ->
      s"""WITH ex AS (SELECT probe_id, neighbor_id FROM ($SimTopKOracleSql) e),
         |ap AS (SELECT probe_id, neighbor_id FROM ($IvfTopKOracleSql) a),
         |h AS (SELECT probe_id, count(*) AS n_hits
         |FROM ap JOIN ex USING (probe_id, neighbor_id) GROUP BY probe_id)
         |SELECT p.probe_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / 5.0, 6) AS recall_at_k
         |FROM (SELECT DISTINCT probe_id FROM ex) p
         |LEFT JOIN h ON h.probe_id = p.probe_id""".stripMargin,
    // spherical k-means, 2 unrolled Lloyd iterations: argmax E-step
    // (cosine desc, cell asc) + integer-nano M-step (exact BIGINT sums,
    // one correctly-rounded double division per (cell, dim))
    "q_kmeans" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |c0 AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
        |WHERE vec_id >= 5 AND vec_id < 13),
        |a1 AS (SELECT vec_id, v, cell FROM (
        |SELECT a.vec_id, a.v, c.cell, row_number() OVER (PARTITION BY a.vec_id
        |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
        |FROM nn a CROSS JOIN c0 c) t WHERE rn = 1),
        |e1 AS (SELECT cell, unnest(v) AS x, unnest(range(1, len(v)+1)) AS pos FROM a1),
        |m1 AS (SELECT cell, pos, CAST(sum(CAST(round(x * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |/ CAST(count(*) * 1000000000 AS DOUBLE) AS mv FROM e1 GROUP BY cell, pos),
        |c1 AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM
        |(SELECT cell, list(mv ORDER BY pos) AS cv FROM m1 GROUP BY cell) t
        |WHERE list_dot_product(cv, cv) > 0),
        |a2 AS (SELECT vec_id, v, cell FROM (
        |SELECT a.vec_id, a.v, c.cell, row_number() OVER (PARTITION BY a.vec_id
        |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
        |FROM nn a CROSS JOIN c1 c) t WHERE rn = 1),
        |e2 AS (SELECT cell, unnest(v) AS x, unnest(range(1, len(v)+1)) AS pos FROM a2),
        |m2 AS (SELECT cell, pos, CAST(sum(CAST(round(x * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |/ CAST(count(*) * 1000000000 AS DOUBLE) AS mv FROM e2 GROUP BY cell, pos),
        |c2 AS (SELECT cell, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM
        |(SELECT cell, list(mv ORDER BY pos) AS cv FROM m2 GROUP BY cell) t
        |WHERE list_dot_product(cv, cv) > 0),
        |af AS (SELECT vec_id, cell FROM (
        |SELECT a.vec_id, c.cell, row_number() OVER (PARTITION BY a.vec_id
        |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
        |FROM nn a CROSS JOIN c2 c) t WHERE rn = 1)
        |SELECT af.cell, CAST(count(*) AS BIGINT) AS n_vecs,
        |round(any_value(list_sum(c2.cv)), 6) AS cv_sum,
        |round(any_value(c2.cn), 6) AS cv_norm
        |FROM af JOIN c2 ON c2.cell = af.cell GROUP BY af.cell""".stripMargin,
    // trained-IVF recall gate: the ground truth is the exact top-k CTE;
    // the law booleans replay as literal TRUE
    "q_sim_topk_ivf_trained" ->
      s"""SELECT count(DISTINCT probe_id) AS n_probes, count(*) AS n_true_pairs,
         |TRUE AS recall_ok FROM ($SimTopKOracleSql) b""".stripMargin,
    "q_embed_neardup" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |array_to_string(list_transform(range(8), i -> CASE WHEN v[(i % len(v)) + 1] > 0 THEN '1' ELSE '0' END), '') AS bucket
        |FROM n)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |list_dot_product(a.v, b.v)/(a.nrm*b.nrm) AS cos_sim
        |FROM nn a JOIN nn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)/(a.nrm*b.nrm) >= 0.25""".stripMargin,
    // exact embedding decontamination: brute-force max eval cosine per
    // corpus vector, argmax tie to the lowest eval id, gate at 0.3
    "q_decontaminate_embed" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n
        |WHERE list_dot_product(v, v) > 0),
        |ev AS (SELECT vec_id AS eval_id, v AS ev, nrm AS en FROM nn WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id, v, nrm FROM nn WHERE vec_id % 50 <> 0),
        |s AS (SELECT c.vec_id, ev.eval_id,
        |list_dot_product(c.v, ev.ev)/(c.nrm*ev.en) AS cs FROM c CROSS JOIN ev),
        |m AS (SELECT vec_id, eval_id, cs, row_number() OVER (
        |PARTITION BY vec_id ORDER BY cs DESC, eval_id ASC) AS rn FROM s)
        |SELECT vec_id, eval_id AS nearest_eval, round(cs, 6) AS cos_sim
        |FROM m WHERE rn = 1 AND cs >= 0.3""".stripMargin,
    // IVF-blocked decontamination: identical cell assignment (centroids
    // = corpus vec_id in [1, 17), nearest-cell argmax, 4 probed cells
    // per eval vector), then the same per-vector argmax + 0.3 gate over
    // cell-mates only
    "q_decontaminate_embed_ivf" -> DeconEmbedIvfOracleSql,
    // the index-backed steady-state form computes the IDENTICAL result
    // (same cells, probes, argmax, gate) off the persisted inverted
    // file — same oracle text, the q_corpus_report_incr convention
    "q_decontaminate_embed_incr" -> DeconEmbedIvfOracleSql,
    // the auto-bits scale form, blocking recomputed from the corpus:
    // bits = clamp(ceil_log2(max(1, n/1024)), 4, 24) — bit_length via
    // floor(log2)+1 (log2 of powers of two is exact in IEEE doubles) —
    // and the rotation count capped by the dim-window period
    // d/gcd(d, bits), both exactly as SimSearch.autoBits/embedNearDup
    "q_embed_neardup_auto" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |params AS (SELECT LEAST(24, GREATEST(4,
        |CAST(FLOOR(LOG2(CAST(GREATEST(1, GREATEST(1,
        |(SELECT count(*) FROM embeddings) // 1024) - 1) AS DOUBLE))) AS INT) + 1)) AS bits),
        |dims AS (SELECT min(len(v)) AS d FROM n),
        |rotp AS (SELECT bits, GREATEST(1, LEAST(2, d // gcd(d, bits))) AS nrot
        |FROM params, dims),
        |rots AS (SELECT bits, unnest(range(nrot)) AS rot FROM rotp),
        |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm, rot,
        |array_to_string(list_transform(range(bits),
        |i -> CASE WHEN v[((rot*bits + i) % len(v)) + 1] > 0 THEN '1' ELSE '0' END), '') AS bucket
        |FROM n CROSS JOIN rots)
        |SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b,
        |list_dot_product(a.v, b2.v)/(a.nrm*b2.nrm) AS cos_sim
        |FROM b a JOIN b b2 ON a.rot = b2.rot AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        |WHERE list_dot_product(a.v, b2.v)/(a.nrm*b2.nrm) >= 0.25""".stripMargin,
    "q_embed_quant" ->
      """WITH q AS (SELECT vec_id,
        |list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |coalesce(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 0.0) AS ma
        |FROM embeddings),
        |c AS (SELECT vec_id, ma,
        |list_transform(v, x -> CASE WHEN ma = 0 THEN CAST(0 AS BIGINT)
        |ELSE CAST(round(x * 127 / ma) AS BIGINT) END) AS codes FROM q)
        |SELECT vec_id, CAST(len(codes) AS BIGINT) AS n_dims,
        |CAST(coalesce(list_sum(codes), 0) AS BIGINT) AS code_sum,
        |CAST(list_min(codes) AS BIGINT) AS code_min,
        |CAST(list_max(codes) AS BIGINT) AS code_max,
        |ma / 127 AS scale FROM c""".stripMargin,
    // generated at oracle-build time from the same coordinate-hash
    // matrix the engine materializes (SimSearch.RandomProject)
    "q_embed_rp" -> graft.ops.SimSearch.randomProjectOracleSql,
    // power iteration: micro-quantized elements, exact BIGINT folds,
    // abs/sign divisions, max-norm renorm — 3 unrolled rounds
    "q_power_iter" -> powerIterOracleSql(3),
    // q_embed_neardup's pair pipeline composed with q_dup_clusters'
    // component resolution (two star-contraction levels + the pruned
    // recursive min-label walk on the residual), then the survivor
    // filter: keep vectors in no pair or labeled by themselves, with
    // the represented cluster's size (1 for singletons).
    "q_semantic_dedup" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
        |array_to_string(list_transform(range(8), i -> CASE WHEN v[(i % len(v)) + 1] > 0 THEN '1' ELSE '0' END), '') AS bucket
        |FROM n),
        |pairs AS MATERIALIZED (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        |FROM nn a JOIN nn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v)/(a.nrm*b.nrm) >= 0.25),
        |e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
        |UNION ALL SELECT doc_b, doc_a FROM pairs),
        |m1 AS MATERIALIZED (SELECT u, least(u, min(v)) AS m FROM e0 GROUP BY u),
        |e1 AS MATERIALIZED (SELECT DISTINCT ma.m AS u, mb.m AS v FROM e0
        |JOIN m1 ma ON ma.u = e0.u JOIN m1 mb ON mb.u = e0.v WHERE ma.m <> mb.m),
        |e1s AS MATERIALIZED (SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
        |m2 AS MATERIALIZED (SELECT u, least(u, min(v)) AS m FROM e1s GROUP BY u),
        |e2 AS MATERIALIZED (SELECT DISTINCT ma.m AS u, mb.m AS v FROM e1s
        |JOIN m2 ma ON ma.u = e1s.u JOIN m2 mb ON mb.u = e1s.v WHERE ma.m <> mb.m),
        |e2s AS MATERIALIZED (SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2),
        |wl AS MATERIALIZED (SELECT u, min(label) AS label FROM (
        |WITH RECURSIVE walk(u, label) AS (
        |SELECT DISTINCT u, u FROM e2s
        |UNION
        |SELECT e.v, w.label FROM walk w JOIN e2s e ON e.u = w.u
        |WHERE w.label < e.v)
        |SELECT u, label FROM walk) GROUP BY u),
        |lvl AS (SELECT m1.u AS vid, coalesce(m2.m, m1.m) AS s2
        |FROM m1 LEFT JOIN m2 ON m2.u = m1.m),
        |lbl AS (SELECT lvl.vid, coalesce(wl.label, lvl.s2) AS cluster
        |FROM lvl LEFT JOIN wl ON wl.u = lvl.s2),
        |sizes AS (SELECT cluster, count(*) AS n_members FROM lbl GROUP BY cluster)
        |SELECT e.vec_id, CAST(len(e.embedding) AS BIGINT) AS n_dims,
        |coalesce(s.n_members, 1) AS n_members
        |FROM embeddings e
        |LEFT JOIN lbl ON lbl.vid = e.vec_id
        |LEFT JOIN sizes s ON s.cluster = e.vec_id
        |WHERE lbl.vid IS NULL OR lbl.cluster = e.vec_id""".stripMargin,
    "q_cluster" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
        |WHERE vec_id >= 5 AND vec_id < 21),
        |sims AS (SELECT a.vec_id, c.cell,
        |list_dot_product(a.v, c.cv)/(a.nrm*c.cn) AS s FROM nn a CROSS JOIN cents c),
        |best AS (SELECT vec_id, cell, s FROM
        |(SELECT vec_id, cell, s, row_number() OVER
        |(PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS rn FROM sims) t WHERE rn = 1)
        |SELECT cell, count(*) AS n_vecs, avg(s) AS avg_sim FROM best GROUP BY cell""".stripMargin,
    // same assignment CTEs as q_cluster, then exact cell counts, the
    // integer cut on the 1e-6 grid, and the salted md5 draw
    "q_density_sample" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
        |WHERE vec_id >= 5 AND vec_id < 21),
        |sims AS (SELECT a.vec_id, c.cell,
        |list_dot_product(a.v, c.cv)/(a.nrm*c.cn) AS s FROM nn a CROSS JOIN cents c),
        |best AS (SELECT vec_id, cell FROM
        |(SELECT vec_id, cell, row_number() OVER
        |(PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS rn FROM sims) t WHERE rn = 1),
        |sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_cell,
        |least(CAST(1000000 AS BIGINT),
        |CAST(round(20 * 1000000.0 / count(*)) AS BIGINT)) AS cut
        |FROM best GROUP BY cell)
        |SELECT b.vec_id, b.cell, sz.n_cell, sz.cut
        |FROM best b JOIN sz USING (cell)
        |WHERE CAST(('0x'||substr(md5('ds:' || CAST(b.vec_id AS VARCHAR)),1,15)) AS BIGINT)
        |% 1000000 < sz.cut""".stripMargin,
    // same assignment CTEs as q_cluster; the outlier boolean runs in
    // exact integer nanos (cross-multiplied, division-free)
    "q_embed_outlier" ->
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings WHERE list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |list_transform(embedding, x -> CAST(x AS DOUBLE))) > 0),
        |nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM n),
        |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM nn
        |WHERE vec_id >= 5 AND vec_id < 21),
        |sims AS (SELECT a.vec_id, c.cell,
        |list_dot_product(a.v, c.cv)/(a.nrm*c.cn) AS s FROM nn a CROSS JOIN cents c),
        |best AS (SELECT vec_id, cell, s FROM
        |(SELECT vec_id, cell, s, row_number() OVER
        |(PARTITION BY vec_id ORDER BY s DESC, cell ASC) AS rn FROM sims) t WHERE rn = 1),
        |b AS (SELECT vec_id, cell, CAST(round(s * 1000000000.0) AS BIGINT) AS sim_nano FROM best),
        |st AS (SELECT cell, count(*) AS n_vecs, sum(sim_nano) AS tot_nano FROM b GROUP BY cell)
        |SELECT b.vec_id, b.cell, b.sim_nano,
        |(b.sim_nano * st.n_vecs < st.tot_nano - 50000000 * st.n_vecs) AS is_outlier
        |FROM b JOIN st USING (cell)""".stripMargin,
    // Same total ordering key (ts DESC, event_id DESC) as the engine's
    // max_by struct — the window form here is the semantic spec, the
    // engine's aggregate form is the scale shape.
    "q_upsert" ->
      """WITH v AS (SELECT user_id, event_type, event_id, ts, value,
        |row_number() OVER (PARTITION BY user_id, event_type
        |ORDER BY ts DESC, event_id DESC) AS rn,
        |count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
        |FROM events)
        |SELECT user_id, event_type, event_id AS last_event_id, ts AS last_ts,
        |value AS last_value, n_versions FROM v WHERE rn = 1""".stripMargin,
    "q_hist" ->
      """SELECT event_type,
        |CAST(least(greatest(floor(value / 50.0), 0), 9) AS BIGINT) AS bucket,
        |count(*) AS n, min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_scd2" ->
      """SELECT user_id, event_type, event_id, value, ts AS valid_from,
        |lead(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS valid_to,
        |CAST((lead(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) IS NULL) AS BIGINT) AS is_current
        |FROM events""".stripMargin,
    "q_anomaly" ->
      """WITH s AS (SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
        |FROM events GROUP BY event_type)
        |SELECT e.event_type, e.event_id, e.value,
        |(e.value - s.mu) / nullif(s.sigma, 0) AS zscore,
        |CAST((abs((e.value - s.mu) / nullif(s.sigma, 0)) > 3.0) AS BIGINT) AS is_anomaly
        |FROM events e JOIN s USING (event_type)""".stripMargin,
    // The 16-term interleave is generated, not hand-spelled, so the bit
    // layout cannot drift from Layout.zValue's fold.
    "q_zorder" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"(((ux >> $i) & 1) << ${2 * i})",
        s"(((vy >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
      s"""WITH b AS (SELECT user_id, value, user_id & 255 AS ux,
         |CAST(least(greatest(floor(value / 2.0), 0), 255) AS BIGINT) AS vy FROM events),
         |z AS (SELECT user_id, value, ($terms) AS z FROM b)
         |SELECT z >> 11 AS zbucket, count(*) AS n,
         |min(user_id) AS min_user, max(user_id) AS max_user,
         |min(value) AS min_value, max(value) AS max_value,
         |min(z) AS min_z, max(z) AS max_z
         |FROM z GROUP BY 1""".stripMargin
    },
    // Zipped unnests (pos, span) mirror the engine's in-row chunking;
    // the NOT IN reproduces the broadcast boilerplate filter; span
    // identity is the 60-bit md5 prefix, like the engine's md5_bits.
    "q_line_dedup" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents),
        |sp AS (SELECT doc_id,
        |unnest(range(0, CAST(ceil(len(toks)/16.0) AS BIGINT))) AS pos,
        |unnest(list_transform(range(0, CAST(ceil(len(toks)/16.0) AS BIGINT)),
        |i -> array_to_string(toks[(i*16+1):(i*16+16)], ' '))) AS span FROM t),
        |sph AS (SELECT doc_id, pos, span,
        |CAST(('0x'||substr(md5(span),1,15)) AS BIGINT) AS h FROM sp),
        |freq AS (SELECT h FROM sph GROUP BY h HAVING count(*) >= 2),
        |kept AS (SELECT doc_id, pos, span FROM sph
        |WHERE h NOT IN (SELECT h FROM freq)),
        |tot AS (SELECT doc_id, count(*) AS n_spans FROM sph GROUP BY doc_id),
        |k AS (SELECT doc_id, count(*) AS n_kept,
        |string_agg(span, ' ' ORDER BY pos) AS clean_text FROM kept GROUP BY doc_id)
        |SELECT tot.doc_id, CAST(tot.n_spans AS BIGINT) AS n_spans,
        |CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |coalesce(k.clean_text, '') AS clean_text
        |FROM tot LEFT JOIN k ON k.doc_id = tot.doc_id""".stripMargin,
    // Incremental form: the frequent set comes from the 95% corpus ONLY
    // (intra-delta repetition is deliberately not counted — the batch
    // re-run owns that), mirroring spanDedupAgainstIndex exactly.
    "q_line_dedup_incr" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0),
        |delta AS (SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |ct AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM corpus),
        |csp AS (SELECT unnest(list_transform(range(0, CAST(ceil(len(toks)/16.0) AS BIGINT)),
        |i -> CAST(('0x'||substr(md5(array_to_string(toks[(i*16+1):(i*16+16)], ' ')),1,15)) AS BIGINT))) AS h
        |FROM ct),
        |freq AS (SELECT h FROM csp GROUP BY h HAVING count(*) >= 2),
        |dt AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM delta),
        |dsp AS (SELECT doc_id,
        |unnest(range(0, CAST(ceil(len(toks)/16.0) AS BIGINT))) AS pos,
        |unnest(list_transform(range(0, CAST(ceil(len(toks)/16.0) AS BIGINT)),
        |i -> array_to_string(toks[(i*16+1):(i*16+16)], ' '))) AS span FROM dt),
        |kept AS (SELECT doc_id, pos, span FROM dsp
        |WHERE CAST(('0x'||substr(md5(span),1,15)) AS BIGINT) NOT IN (SELECT h FROM freq)),
        |tot AS (SELECT doc_id, count(*) AS n_spans FROM dsp GROUP BY doc_id),
        |k AS (SELECT doc_id, count(*) AS n_kept,
        |string_agg(span, ' ' ORDER BY pos) AS clean_text FROM kept GROUP BY doc_id)
        |SELECT tot.doc_id, CAST(tot.n_spans AS BIGINT) AS n_spans,
        |CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |coalesce(k.clean_text, '') AS clean_text
        |FROM tot LEFT JOIN k ON k.doc_id = tot.doc_id""".stripMargin,
    // Stage predicates are verbatim from q_text_quality / q_repetition /
    // q_dedup / q_decontaminate's oracles; the CASE order is the
    // engine's first-failing-stage attribution.
    "q_corpus_clean" ->
      """WITH corpus AS (SELECT doc_id, text, lang FROM documents WHERE doc_id >= 50),
        |q AS (SELECT doc_id, CAST((n_tok >= 10
        |AND CAST(punct AS DOUBLE)/nullif(length(text), 0) < 0.3
        |AND CAST(stop_hits AS DOUBLE)/n_tok > 0.01) AS BIGINT) AS q_keep
        |FROM (SELECT doc_id, text,
        |len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok,
        |len(regexp_extract_all(lower(text), '[^a-z0-9\s]')) AS punct,
        |len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x IN ('the','a','an','and','of','to','in','is','on','for'))) AS stop_hits
        |FROM corpus) t),
        |rtoks AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM corpus),
        |r2 AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN 1.0 -
        |CAST(len(list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
        |/ (len(toks) - 1) ELSE 0.0 END AS dup2 FROM rtoks),
        |tc AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_nonempty FROM (
        |SELECT doc_id, tok, count(*) AS c FROM (SELECT doc_id, unnest(toks) AS tok FROM rtoks) u
        |WHERE tok <> '' GROUP BY doc_id, tok) g GROUP BY doc_id),
        |r AS (SELECT r2.doc_id,
        |CAST((CAST(top_c AS DOUBLE)/n_nonempty < 0.2 AND dup2 < 0.2) AS BIGINT) AS r_keep
        |FROM r2 JOIN tc ON tc.doc_id = r2.doc_id),
        |d AS (SELECT doc_id, CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY
        |md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) THEN 1 ELSE 0 END AS is_dup
        |FROM corpus),
        |ev AS (SELECT DISTINCT
        |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
        |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
        |FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |FROM documents WHERE doc_id < 50) t WHERE len(toks) >= 8),
        |corp AS (SELECT DISTINCT doc_id,
        |unnest(list_transform(range(0, greatest(len(toks)-7, 0)),
        |i -> CAST(('0x'||substr(md5(array_to_string(toks[i+1:i+8], ' ')),1,15)) AS BIGINT))) AS shingle
        |FROM rtoks WHERE len(toks) >= 8),
        |ct AS (SELECT doc_id FROM corp GROUP BY doc_id
        |HAVING CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev) THEN 1 ELSE 0 END) AS DOUBLE)
        |/count(*) >= 0.05),
        |lab AS (SELECT c.doc_id, length(c.text) AS n_chars,
        |CASE WHEN c.lang <> 'en' THEN 'lang'
        |WHEN q.q_keep = 0 THEN 'quality'
        |WHEN coalesce(r.r_keep, 1) = 0 THEN 'repetition'
        |WHEN d.is_dup = 1 THEN 'duplicate'
        |WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
        |ELSE 'keep' END AS reason
        |FROM corpus c JOIN q USING (doc_id) LEFT JOIN r USING (doc_id)
        |JOIN d USING (doc_id) LEFT JOIN ct USING (doc_id))
        |SELECT reason, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM lab GROUP BY reason""".stripMargin,
    // Gap arithmetic is integer epoch-microseconds on both sides
    // (720 min = 43_200_000_000 us); ties on ts order by event_id.
    "q_sessionize" ->
      """WITH g AS (SELECT user_id, event_id, ts, value,
        |CASE WHEN lag(ts) OVER w IS NULL
        |OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000 THEN 1 ELSE 0 END AS new_sess
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, value,
        |sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no FROM g)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |min(ts) AS session_start, max(ts) AS session_end,
        |CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 6) AS total_value
        |FROM s GROUP BY user_id, session_no""".stripMargin,
    // Chained conditional minima: each stage's CTE may only reference the
    // previous stage's window result — the stacked-CTE form of the
    // engine's three chained Window nodes.
    "q_funnel" ->
      """WITH f AS (SELECT user_id, event_type, ts FROM events
        |WHERE event_type IN ('view', 'click', 'purchase')),
        |a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |OVER (PARTITION BY user_id) AS t1 FROM f),
        |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
        |OVER (PARTITION BY user_id) AS t2 FROM a),
        |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |OVER (PARTITION BY user_id) AS t3 FROM b)
        |SELECT user_id, min(t1) AS t_stage1, min(t2) AS t_stage2, min(t3) AS t_stage3,
        |CAST(min(t1) IS NOT NULL AS BIGINT) + CAST(min(t2) IS NOT NULL AS BIGINT)
        |+ CAST(min(t3) IS NOT NULL AS BIGINT) AS stage_reached
        |FROM c GROUP BY user_id""".stripMargin,
    "q_retention" ->
      """WITH fd AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |FROM events GROUP BY user_id),
        |ad AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
        |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
        |CAST(date_diff('day', cohort_day, active_day) AS INT) AS day_offset,
        |CAST(count(*) AS BIGINT) AS n_users
        |FROM ad JOIN fd USING (user_id)
        |WHERE date_diff('day', cohort_day, active_day) <= 7
        |GROUP BY 1, 2""".stripMargin,
    // 5 unrolled damped iterations in integer nano-rank arithmetic —
    // truncating division both at the contribution and the damping, so
    // the chained iterations replay bit-identically
    "q_pagerank" -> pageRankOracleSql(5),
    // the incremental form folds persisted edge partials over the same
    // full event table — edge-count additivity (user-complete batches)
    // makes the SAME batch replay its ground truth
    "q_pagerank_incr" -> pageRankOracleSql(5),
    // user-forget: the SAME unrolled rank text over surviving users
    "q_pagerank_forget" -> pageRankOracleSql(5, "AND user_id % 7 <> 0"),
    // LPA communities: 2 unrolled synchronous rounds over the
    // symmetrized edge CTE, exact integer weights, min-label ties
    "q_label_prop" -> labelPropOracleSql(2),
    // HITS: 3 unrolled (authority, hub) rounds, nano max-norm; the
    // edge-index reads share the batch oracles (edge additivity)
    "q_hits" -> hitsOracleSql(3),
    // next-event pairs: identical trailing ROWS frame; empty frames
    // are NULL in DuckDB where Spark's collect_list is [] - both land
    // on '' and are filtered
    "q_seq_dataset" ->
      """SELECT user_id, event_id, context, label FROM (
        |SELECT user_id, event_id,
        |coalesce(array_to_string(list(event_type) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), ' '), '') AS context,
        |event_type AS label FROM events) z WHERE context <> ''""".stripMargin,
    // approx MAU: oracle recomputes the exact side; the HLL law must
    // hold as a hash-equal TRUE (the q_agg_approx_distinct pattern)
    // KMV replay: the merged bottom-k of per-day sketches over a
    // trailing window EQUALS the k smallest distinct hashes of the
    // whole window (any union-minimum is its own day's minimum), so
    // the oracle computes the window sketch directly — estimate and
    // relative error are deterministic data, not a probabilistic bound
    "q_mau_approx" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |spine AS (SELECT DISTINCT day AS report_day FROM act),
        |ex AS (SELECT s.report_day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS mau_exact
        |FROM spine s JOIN act a ON a.day BETWEEN s.report_day - 29 AND s.report_day
        |GROUP BY s.report_day),
        |wh AS (SELECT DISTINCT s.report_day,
        |CAST(('0x'||substr(md5(CAST(a.user_id AS VARCHAR)),1,13)) AS BIGINT) AS uh
        |FROM spine s JOIN act a ON a.day BETWEEN s.report_day - 29 AND s.report_day),
        |rk AS (SELECT report_day, uh,
        |row_number() OVER (PARTITION BY report_day ORDER BY uh) AS r,
        |count(*) OVER (PARTITION BY report_day) AS nh FROM wh),
        |sk AS (SELECT report_day, CAST(least(nh, 256) AS BIGINT) AS k_used,
        |CASE WHEN nh < 256 THEN CAST(least(nh, 256) AS DOUBLE)
        |ELSE 255e0 * 4503599627370496e0 / CAST(max(CASE WHEN r = 256 THEN uh END) AS DOUBLE) END AS est
        |FROM rk WHERE r <= 256 GROUP BY report_day, nh)
        |SELECT CAST(e.report_day AS TIMESTAMP) AS report_day, e.mau_exact,
        |s.k_used, round(s.est, 3) AS mau_est,
        |round(abs(s.est - e.mau_exact) / e.mau_exact, 6) AS rel_err
        |FROM ex e JOIN sk s USING (report_day)""".stripMargin,
    // MAU: the plain BETWEEN spelling over the activity spine
    "q_mau" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |spine AS (SELECT DISTINCT day AS report_day FROM act)
        |SELECT CAST(s.report_day AS TIMESTAMP) AS report_day,
        |CAST(count(DISTINCT a.user_id) AS BIGINT) AS mau
        |FROM spine s JOIN act a
        |ON a.day BETWEEN s.report_day - 29 AND s.report_day
        |GROUP BY s.report_day""".stripMargin,
    "q_hits_incr" -> hitsOracleSql(3),
    "q_label_prop_incr" -> labelPropOracleSql(2),
    // Running coverage over the top-k only; the (n DESC, token ASC) order
    // key is unique per row, so the default RANGE frame has no peers and
    // both engines' running sums agree row-by-row.
    "q_vocab" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        |FROM documents),
        |c AS (SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token),
        |t AS (SELECT sum(n) AS total_n FROM c),
        |k AS (SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT 200)
        |SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS rank,
        |token, CAST(n AS BIGINT) AS n,
        |round(CAST(sum(n) OVER (ORDER BY n DESC, token ASC) AS DOUBLE)
        |/ CAST(total_n AS DOUBLE), 6) AS cum_share
        |FROM k, t""".stripMargin,
    // All-double arithmetic in list order on both sides; empty lists
    // guarded (list_sum of [] is NULL where the engine's fold is 0).
    "q_embed_norm" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings),
        |n AS (SELECT vec_id, v,
        |sqrt(coalesce(list_sum(list_transform(v, x -> x * x)), 0.0)) AS l2_norm FROM q)
        |SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims, round(l2_norm, 6) AS l2_norm,
        |round(CASE WHEN l2_norm = 0 THEN coalesce(list_sum(v), 0.0)
        |ELSE list_sum(list_transform(v, x -> x / l2_norm)) END, 6) AS unit_sum
        |FROM n""".stripMargin,
    // BM25 k1=1.2 b=0.75; only docs matching ≥1 query term score a row
    // (inner joins). The 1e-16 double-literal delta between the engine's
    // computed k1+1 and the SQL's 2.2 dies in the round-to-6.
    "q_bm25" -> Bm25OracleSql,
    // the index read must equal the batch scorer over the union —
    // q_bm25's oracle text verbatim IS the incremental gate
    "q_bm25_incr" -> Bm25OracleSql,
    // deletion propagation: the index after forgetting doc_id % 17 = 0
    // must equal the batch scorer over the surviving corpus — for both
    // the tombstone read and the post-purge read
    "q_forget" -> bm25OracleSqlOver("WHERE doc_id % 17 <> 0"),
    "q_forget_purge" -> bm25OracleSqlOver("WHERE doc_id % 17 <> 0"),
    // Preference pairs: same 6-dp stopword-ratio grid, rank within the
    // doc_id-div-2 bucket (score DESC, doc_id DESC), complete pairs only.
    "q_pref_pairs" ->
      """WITH s AS (SELECT doc_id, doc_id // 2 AS pair_id,
        |round(CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> list_contains(['the','a','an','and','of','to','in','is','on','for'], x))) AS DOUBLE)
        |/ len(regexp_split_to_array(lower(trim(text)), '\s+')), 6) AS score FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY pair_id
        |ORDER BY score DESC, doc_id DESC) AS rn,
        |count(*) OVER (PARTITION BY pair_id) AS np FROM s)
        |SELECT CAST(pair_id AS BIGINT) AS pair_id,
        |max(CASE WHEN rn=1 THEN doc_id END) AS chosen_id,
        |max(CASE WHEN rn=2 THEN doc_id END) AS rejected_id,
        |max(CASE WHEN rn=1 THEN score END) AS chosen_score,
        |max(CASE WHEN rn=2 THEN score END) AS rejected_score,
        |round(max(CASE WHEN rn=1 THEN score END) - max(CASE WHEN rn=2 THEN score END), 6) AS margin
        |FROM r WHERE np = 2 GROUP BY pair_id""".stripMargin,
    // Chat turns: the oracle derives the (prompt, response) pairs from
    // the token stream directly — gating that the engine's
    // serialize -> from_json -> flatten path is lossless.
    "q_chat_turns" ->
      """WITH t AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS tk
        |FROM documents),
        |g AS (SELECT doc_id, tk, CAST(ceil(len(tk)/8.0) AS BIGINT) AS n_turns
        |FROM t WHERE len(tk) > 0),
        |p AS (SELECT doc_id, unnest(range(0, n_turns // 2)) AS i, tk
        |FROM g WHERE n_turns >= 2),
        |r AS (SELECT doc_id, i,
        |array_to_string(tk[i*16+1 : i*16+8], ' ') AS prompt,
        |array_to_string(tk[i*16+9 : i*16+16], ' ') AS response FROM p)
        |SELECT doc_id, CAST(i AS BIGINT) AS pair_idx, prompt, response,
        |CAST(len(string_split(prompt, ' ')) AS BIGINT) AS n_prompt_tok,
        |CAST(len(string_split(response, ' ')) AS BIGINT) AS n_response_tok FROM r""".stripMargin,
    // Boolean retrieval: all must-terms present (distinct count), no
    // mustNot term; tf_sum = total must-term hits.
    "q_bool_search" ->
      """WITH tok AS (SELECT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
        |WHERE token IN ('data', 'query') GROUP BY doc_id, token),
        |pos AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_sum
        |FROM tf GROUP BY doc_id HAVING count(*) = 2)
        |SELECT doc_id, tf_sum FROM pos
        |WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE token = 'fast')""".stripMargin,
    "q_phrase_search" -> PhraseOracleSql,
    // the positional index is invisible to semantics: same oracle
    "q_phrase_search_incr" -> PhraseOracleSql,
    // forget: same adjacency text over the surviving corpus only
    "q_phrase_forget" -> phraseOracleSqlOver("WHERE doc_id % 17 <> 0"),
    // Hybrid RRF: the Bm25 oracle's per-doc score feeds the text list,
    // the SimTopK dot-product spelling feeds the vector list, each cut
    // at 50 (score desc, id asc), fused at 1/(60+rank) on the 9-dp grid.
    "q_hybrid_rrf" ->
      """WITH tok AS (SELECT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
        |WHERE token IN ('data', 'query', 'engine', 'fast') GROUP BY token),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
        |WHERE token IN ('data', 'query', 'engine', 'fast') GROUP BY doc_id, token),
        |bm AS (SELECT doc_id,
        |round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2
        |/ (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS bm25
        |FROM tf JOIN dfx USING (token) JOIN dl USING (doc_id), st
        |GROUP BY doc_id),
        |ttop AS (SELECT doc_id, bm25 FROM bm
        |ORDER BY bm25 DESC, doc_id ASC LIMIT 50),
        |tr AS (SELECT doc_id, CAST(row_number() OVER
        |(ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS r_text FROM ttop),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |FROM embeddings) e WHERE list_dot_product(v, v) > 0),
        |p AS (SELECT v AS pv, nrm AS pn FROM n WHERE vec_id = 0),
        |cos AS (SELECT vec_id AS doc_id,
        |list_dot_product(v, pv)/(nrm*pn) AS cos_sim
        |FROM n, p WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, doc_id ASC LIMIT 50),
        |vr AS (SELECT doc_id, CAST(row_number() OVER
        |(ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT) AS r_vec FROM cos),
        |f AS (SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id, r_text, r_vec,
        |round(coalesce(1.0/(60.0+r_text), 0) + coalesce(1.0/(60.0+r_vec), 0), 9) AS rrf
        |FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id),
        |top AS (SELECT * FROM f ORDER BY rrf DESC, doc_id ASC LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank,
        |doc_id, r_text, r_vec, rrf FROM top""".stripMargin,
    "q_mmr" -> mmrOracleSql(10, 5),
    "q_mmr_batch" -> mmrBatchOracleSql(3, 8, 3),
    // Bitext mining: identical nano-grid cosines (floor of the same
    // IEEE double), identical (c desc, id asc) k-NN cuts, exact long
    // margin arithmetic 2k·c − Σ_NNk(x) − Σ_NNk(y) with k = 4.
    "q_bitext_mine" ->
      """WITH base AS (SELECT vec_id, label,
        |list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM base WHERE list_dot_product(v, v) > 0),
        |xs AS (SELECT * FROM n WHERE label % 2 = 0),
        |ys AS (SELECT * FROM n WHERE label % 2 = 1),
        |pr AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pn FROM xs WHERE vec_id < 50),
        |xy AS (SELECT probe_id, ys.vec_id AS y_id,
        |CAST(floor(list_dot_product(ys.v, pv)/(ys.nrm*pn)*1e9) AS BIGINT) AS c_nano
        |FROM ys, pr),
        |xyr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |ORDER BY c_nano DESC, y_id ASC) AS r FROM xy),
        |topxy AS (SELECT probe_id, y_id, c_nano FROM xyr WHERE r <= 4),
        |sx AS (SELECT probe_id, CAST(sum(c_nano) AS BIGINT) AS sx FROM topxy GROUP BY probe_id),
        |cand AS (SELECT DISTINCT y_id FROM topxy),
        |yx AS (SELECT ys2.vec_id AS y_id, xs.vec_id AS x_id,
        |CAST(floor(list_dot_product(xs.v, ys2.v)/(xs.nrm*ys2.nrm)*1e9) AS BIGINT) AS c
        |FROM ys ys2 JOIN cand ON ys2.vec_id = cand.y_id CROSS JOIN xs),
        |yxr AS (SELECT *, row_number() OVER (PARTITION BY y_id
        |ORDER BY c DESC, x_id ASC) AS r FROM yx),
        |sy AS (SELECT y_id, CAST(sum(c) AS BIGINT) AS sy FROM yxr WHERE r <= 4 GROUP BY y_id),
        |m AS (SELECT t.probe_id, t.y_id, t.c_nano,
        |CAST(8*t.c_nano - sx.sx - sy.sy AS BIGINT) AS margin_nano,
        |CAST(800*t.c_nano > 110*(sx.sx + sy.sy) AS INT) AS keep
        |FROM topxy t JOIN sx USING (probe_id) JOIN sy USING (y_id)),
        |best AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |ORDER BY margin_nano DESC, y_id ASC) AS r FROM m)
        |SELECT y_id, probe_id, c_nano, margin_nano FROM best
        |WHERE r = 1 AND keep = 1""".stripMargin,
    // IVF-blocked bitext: the same nano-grid margin law with BOTH pools
    // assigned to sampled centroids (vec_ids [5,21), argmax sim-then-
    // lowest-cell — the q_knn_clf_ivf spelling) and every candidate /
    // reverse-neighborhood join restricted to the cell; neighborhoods
    // can run short of k, so margins use actual counts (nx+ny)·c.
    "q_bitext_mine_ivf" ->
      """WITH base AS (SELECT vec_id, label,
        |list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
        |FROM base WHERE list_dot_product(v, v) > 0),
        |cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM n
        |WHERE vec_id >= 5 AND vec_id < 21),
        |asg AS (SELECT vec_id, label, v, nrm, cell FROM (
        |SELECT a.vec_id, a.label, a.v, a.nrm, c.cell,
        |row_number() OVER (PARTITION BY a.vec_id
        |ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC, c.cell ASC) AS rn
        |FROM n a CROSS JOIN cents c) t WHERE rn = 1),
        |xs AS (SELECT * FROM asg WHERE label % 2 = 0),
        |ys AS (SELECT * FROM asg WHERE label % 2 = 1),
        |pr AS (SELECT vec_id AS probe_id, cell, v AS pv, nrm AS pn
        |FROM xs WHERE vec_id < 50),
        |xy AS (SELECT probe_id, ys.vec_id AS y_id,
        |CAST(floor(list_dot_product(ys.v, pv)/(ys.nrm*pn)*1e9) AS BIGINT) AS c_nano
        |FROM ys JOIN pr ON ys.cell = pr.cell),
        |xyr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |ORDER BY c_nano DESC, y_id ASC) AS r FROM xy),
        |topxy AS (SELECT probe_id, y_id, c_nano FROM xyr WHERE r <= 4),
        |sx AS (SELECT probe_id, CAST(sum(c_nano) AS BIGINT) AS sx,
        |CAST(count(*) AS BIGINT) AS nx FROM topxy GROUP BY probe_id),
        |cand AS (SELECT DISTINCT y_id FROM topxy),
        |yx AS (SELECT y2.vec_id AS y_id, xs.vec_id AS x_id,
        |CAST(floor(list_dot_product(xs.v, y2.v)/(xs.nrm*y2.nrm)*1e9) AS BIGINT) AS c
        |FROM ys y2 JOIN cand ON y2.vec_id = cand.y_id
        |JOIN xs ON xs.cell = y2.cell),
        |yxr AS (SELECT *, row_number() OVER (PARTITION BY y_id
        |ORDER BY c DESC, x_id ASC) AS r FROM yx),
        |sy AS (SELECT y_id, CAST(sum(c) AS BIGINT) AS sy,
        |CAST(count(*) AS BIGINT) AS ny FROM yxr WHERE r <= 4 GROUP BY y_id),
        |m AS (SELECT t.probe_id, t.y_id, t.c_nano,
        |CAST((sx.nx + sy.ny)*t.c_nano - sx.sx - sy.sy AS BIGINT) AS margin_nano,
        |CAST(100*(sx.nx + sy.ny)*t.c_nano > 110*(sx.sx + sy.sy) AS INT) AS keep
        |FROM topxy t JOIN sx USING (probe_id) JOIN sy USING (y_id)),
        |best AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |ORDER BY margin_nano DESC, y_id ASC) AS r FROM m)
        |SELECT probe_id, y_id, c_nano, margin_nano FROM best
        |WHERE r = 1 AND keep = 1""".stripMargin,
    // Same 60-bit md5 token hash as the dedup lanes; add-one smoothing
    // over 256 buckets; candidates are the non-target docs.
    "q_dsir" ->
      """WITH tok AS (SELECT doc_id,
        |(lang = 'en' AND source IN ('src1', 'src2', 'src3')) AS is_target, t AS token
        |FROM (SELECT doc_id, lang, source,
        |unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |b AS (SELECT doc_id, is_target,
        |CAST(('0x'||substr(md5(token),1,15)) AS BIGINT) % 256 AS bkt FROM tok),
        |c AS (SELECT bkt, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_cnt,
        |sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS r_cnt FROM b GROUP BY bkt),
        |tt AS (SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot FROM c),
        |lam AS (SELECT bkt, ln((t_cnt + 1.0) / (t_tot + 256))
        |- ln((r_cnt + 1.0) / (r_tot + 256)) AS lam FROM c, tt)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |round(avg(lam), 6) AS dsir_weight
        |FROM b JOIN lam USING (bkt) WHERE NOT is_target GROUP BY doc_id""".stripMargin,
    // Window 64 / stride 48; DuckDB list slice is 1-based inclusive on
    // both ends, so [s*48+1 : s*48+64] is Spark's slice(toks, s*48+1, 64).
    "q_chunk" ->
      """WITH t AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '') AS toks
        |FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n_tok FROM t WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks, n_tok,
        |unnest(range(0, 1 + CAST(ceil(greatest(n_tok - 64, 0) / 48.0) AS INT))) AS chunk_id
        |FROM n)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |CAST(least(64, n_tok - chunk_id * 48) AS BIGINT) AS n_tok,
        |array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text
        |FROM c""".stripMargin,
    // Backreference dialects differ: Spark spells $1, DuckDB \1.
    "q_dedup_url" ->
      """WITH m AS (SELECT doc_id,
        |(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://' END)
        ||| source || '.Example.COM/docs/' || CAST(doc_id % 40 AS VARCHAR)
        ||| (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
        ||| (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&ref=x' ELSE '' END)
        ||| (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url FROM documents),
        |c AS (SELECT doc_id,
        |regexp_replace(regexp_replace(
        |lower(regexp_extract(url, '^([a-zA-Z]+://[^/?#]*)', 1))
        ||| regexp_extract(url, '^[a-zA-Z]+://[^/?#]*([^?#]*)', 1),
        |'^(https?://)www\.', '\1'), '/$', '') AS canon_url FROM m)
        |SELECT min(doc_id) AS doc_id, canon_url, CAST(count(*) AS BIGINT) AS dup_cnt
        |FROM c GROUP BY canon_url""".stripMargin,
    // Per-user dense day spine from that user's own [min, max] span;
    // zero-filled gaps; day emitted as TIMESTAMP for the dtype-stable
    // compare (same DATE→TIMESTAMP convention as q_retention).
    "q_resample" ->
      """WITH pd AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2),
        |sp AS (SELECT user_id, unnest(generate_series(CAST(min(ts) AS DATE),
        |CAST(max(ts) AS DATE), INTERVAL 1 DAY)) AS day
        |FROM events GROUP BY user_id)
        |SELECT sp.user_id, CAST(sp.day AS TIMESTAMP) AS day,
        |coalesce(pd.n_events, 0) AS n_events,
        |coalesce(pd.total_value, 0.0) AS total_value
        |FROM sp LEFT JOIN pd ON pd.user_id = sp.user_id AND pd.day = sp.day""".stripMargin,
    // H = ln(n) - sum(c*ln c)/n over per-(source, token) counts; the
    // normalized form guards the single-token ln(1) division.
    "q_entropy" ->
      """WITH tc AS (SELECT source AS slice, t AS token, count(*) AS c FROM
        |(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> '' GROUP BY 1, 2),
        |s AS (SELECT slice, CAST(sum(c) AS BIGINT) AS n,
        |CAST(count(*) AS BIGINT) AS n_distinct,
        |sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc FROM tc GROUP BY slice)
        |SELECT slice, n, n_distinct,
        |round(ln(CAST(n AS DOUBLE)) - clnc / n, 6) AS entropy,
        |round(CASE WHEN n_distinct = 1 THEN 0.0
        |ELSE (ln(CAST(n AS DOUBLE)) - clnc / n) / ln(CAST(n_distinct AS DOUBLE)) END, 6)
        |AS norm_entropy FROM s""".stripMargin,
    "q_source_overlap" ->
      """WITH st AS (SELECT DISTINCT source AS slice, t AS token FROM
        |(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |sz AS (SELECT slice, CAST(count(*) AS BIGINT) AS n_tok FROM st GROUP BY slice),
        |i AS (SELECT a.slice AS slice_a, b.slice AS slice_b,
        |CAST(count(*) AS BIGINT) AS n_common
        |FROM st a JOIN st b ON a.token = b.token AND a.slice < b.slice
        |GROUP BY 1, 2)
        |SELECT slice_a, slice_b, n_common,
        |round(CAST(n_common AS DOUBLE) / CAST(za.n_tok + zb.n_tok - n_common AS DOUBLE), 6)
        |AS jaccard
        |FROM i JOIN sz za ON za.slice = i.slice_a JOIN sz zb ON zb.slice = i.slice_b""".stripMargin,
    // KMV sketches rebuilt with the same 52-bit md5-prefix hashes (13
    // nibbles — Double-exact, matching the engine's bounded-buffer
    // ordering); every estimate is a pure function of the data, so the
    // gate is a plain hash match. Nested select so the est columns can
    // compose without lateral-alias reliance.
    "q_source_overlap_kmv" ->
      """WITH tok AS (SELECT DISTINCT source AS slice,
        |CAST(('0x'||substr(md5(t),1,13)) AS BIGINT) AS th FROM
        |(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |sig AS (SELECT slice, list(th ORDER BY th) AS sig, max(n_hashes) AS n_hashes
        |FROM (SELECT slice, th,
        |CAST(count(*) OVER (PARTITION BY slice) AS BIGINT) AS n_hashes,
        |row_number() OVER (PARTITION BY slice ORDER BY th) AS rn FROM tok) r
        |WHERE rn <= 256 GROUP BY slice),
        |p AS (SELECT a.slice AS slice_a, b.slice AS slice_b,
        |a.sig AS sa, b.sig AS sb, a.n_hashes AS n_a_hashes, b.n_hashes AS n_b_hashes
        |FROM sig a JOIN sig b ON a.slice < b.slice),
        |m AS (SELECT slice_a, slice_b, n_a_hashes, n_b_hashes, sa, sb,
        |list_sort(list_distinct(list_concat(sa, sb)))[1:256] AS merged FROM p),
        |e AS (SELECT slice_a, slice_b, n_a_hashes, n_b_hashes,
        |CAST(len(merged) AS BIGINT) AS k_used,
        |CAST(len(list_intersect(list_intersect(merged, sa), sb)) AS BIGINT) AS n_match,
        |round(CASE WHEN len(merged) < 256 THEN CAST(len(merged) AS DOUBLE)
        |ELSE 255.0 * 4503599627370496.0 / CAST(merged[256] AS DOUBLE) END, 3) AS union_est
        |FROM m)
        |SELECT slice_a, slice_b, n_a_hashes, n_b_hashes, k_used, n_match, union_est,
        |round(CAST(n_match AS DOUBLE) / CAST(k_used AS DOUBLE), 6) AS jaccard_est,
        |round(round(CAST(n_match AS DOUBLE) / CAST(k_used AS DOUBLE), 6) * union_est, 3)
        |AS inter_est FROM e""".stripMargin,
    // the index replay: per-slice k-smallest over the FULL corpus (the
    // merge law makes that the ground truth for any doc-complete
    // append split), per-slice cardinality as the KMV estimate
    // (n_a_est/n_b_est — the store never re-touches raw text), then
    // the same pair estimators as q_source_overlap_kmv
    "q_source_overlap_incr" ->
      """WITH tok AS (SELECT DISTINCT source AS slice,
        |CAST(('0x'||substr(md5(t),1,13)) AS BIGINT) AS th FROM
        |(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |rk AS (SELECT slice, th,
        |row_number() OVER (PARTITION BY slice ORDER BY th) AS rn,
        |count(*) OVER (PARTITION BY slice) AS nh FROM tok),
        |sig AS (SELECT slice, list(th ORDER BY th) AS sig,
        |round(CASE WHEN max(nh) < 256 THEN CAST(max(nh) AS DOUBLE)
        |ELSE 255e0 * 4503599627370496e0 / CAST(max(CASE WHEN rn = 256 THEN th END) AS DOUBLE) END, 3) AS n_est
        |FROM rk WHERE rn <= 256 GROUP BY slice),
        |p AS (SELECT a.slice AS slice_a, b.slice AS slice_b,
        |a.sig AS sa, b.sig AS sb, a.n_est AS n_a_est, b.n_est AS n_b_est
        |FROM sig a JOIN sig b ON a.slice < b.slice),
        |m AS (SELECT slice_a, slice_b, n_a_est, n_b_est, sa, sb,
        |list_sort(list_distinct(list_concat(sa, sb)))[1:256] AS merged FROM p),
        |e AS (SELECT slice_a, slice_b, n_a_est, n_b_est,
        |CAST(len(merged) AS BIGINT) AS k_used,
        |CAST(len(list_intersect(list_intersect(merged, sa), sb)) AS BIGINT) AS n_match,
        |round(CASE WHEN len(merged) < 256 THEN CAST(len(merged) AS DOUBLE)
        |ELSE 255e0 * 4503599627370496e0 / CAST(merged[256] AS DOUBLE) END, 3) AS union_est
        |FROM m)
        |SELECT slice_a, slice_b, n_a_est, n_b_est, k_used, n_match, union_est,
        |round(CAST(n_match AS DOUBLE) / CAST(k_used AS DOUBLE), 6) AS jaccard_est,
        |round(round(CAST(n_match AS DOUBLE) / CAST(k_used AS DOUBLE), 6) * union_est, 3)
        |AS inter_est FROM e""".stripMargin,
    // JS = H(M) − (H(P)+H(Q))/2 via the same common-tokens + one-sided
    // tails decomposition as the engine: the common-token join carries
    // both counts; per-slice S_half/H scalars come from the c·ln c
    // identity; js_bits derives from the UNROUNDED nats on both sides
    "q_source_drift" ->
      """WITH st AS (SELECT source AS slice, t AS token, count(*) AS c FROM
        |(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> '' GROUP BY 1, 2),
        |sz AS (SELECT slice, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY slice),
        |per AS (SELECT st.slice, max(sz.n) AS n,
        |sum((CAST(c AS DOUBLE)/sz.n/2) * ln(CAST(c AS DOUBLE)/sz.n/2)) AS s_half,
        |ln(CAST(max(sz.n) AS DOUBLE))
        |- sum(CAST(c AS DOUBLE)*ln(CAST(c AS DOUBLE)))/max(sz.n) AS h
        |FROM st JOIN sz ON sz.slice = st.slice GROUP BY st.slice),
        |pr AS (SELECT a.slice AS slice_a, b.slice AS slice_b, a.c AS ca, b.c AS cb,
        |za.n AS n_a, zb.n AS n_b
        |FROM st a JOIN st b ON a.token = b.token AND a.slice < b.slice
        |JOIN sz za ON za.slice = a.slice JOIN sz zb ON zb.slice = b.slice),
        |d AS (SELECT slice_a, slice_b, CAST(count(*) AS BIGINT) AS n_common_types,
        |sum(((CAST(ca AS DOUBLE)/n_a + CAST(cb AS DOUBLE)/n_b)/2)
        |* ln((CAST(ca AS DOUBLE)/n_a + CAST(cb AS DOUBLE)/n_b)/2)
        |- (CAST(ca AS DOUBLE)/n_a/2)*ln(CAST(ca AS DOUBLE)/n_a/2)
        |- (CAST(cb AS DOUBLE)/n_b/2)*ln(CAST(cb AS DOUBLE)/n_b/2)) AS dd
        |FROM pr GROUP BY 1, 2)
        |SELECT d.slice_a, d.slice_b, pa.n AS n_a, pb.n AS n_b, d.n_common_types,
        |round(-(d.dd + pa.s_half + pb.s_half) - (pa.h + pb.h)/2, 6) AS js_nats,
        |round((-(d.dd + pa.s_half + pb.s_half) - (pa.h + pb.h)/2) / ln(2), 6) AS js_bits
        |FROM d JOIN per pa ON pa.slice = d.slice_a
        |JOIN per pb ON pb.slice = d.slice_b""".stripMargin,
    // ln(count) on ln(rank) OLS over the min-count-filtered type table;
    // rank tie-break on token keeps the x-values identical on both sides
    "q_zipf" ->
      """WITH c AS (SELECT source AS slice, t AS token, count(*) AS c FROM
        |(SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> '' GROUP BY 1, 2 HAVING count(*) >= 5),
        |r AS (SELECT slice, c,
        |CAST(row_number() OVER (PARTITION BY slice ORDER BY c DESC, token ASC) AS BIGINT) AS rnk
        |FROM c)
        |SELECT slice, CAST(count(*) AS BIGINT) AS n_types,
        |CAST(sum(c) AS BIGINT) AS n_tokens,
        |round(round(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6), 5) AS zipf_slope,
        |round(round(regr_intercept(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6), 5) AS zipf_intercept,
        |round(round(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 6), 5) AS zipf_r2
        |FROM r GROUP BY slice""".stripMargin,
    // integer-exact bucket arithmetic (// both sides); new-type credit
    // lands on the bucket of the type's first doc_id
    "q_heaps" ->
      """WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
        |tok AS (SELECT doc_id, t AS token FROM
        |(SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents) u WHERE t <> ''),
        |tb AS (SELECT least(doc_id * 100 // (max_id + 1), 99) AS bucket,
        |CAST(count(*) AS BIGINT) AS n_tok FROM tok, mx GROUP BY 1),
        |fb AS (SELECT least(first_id * 100 // (max_id + 1), 99) AS bucket,
        |CAST(count(*) AS BIGINT) AS n_new FROM
        |(SELECT token, min(doc_id) AS first_id FROM tok GROUP BY token) f, mx
        |GROUP BY 1)
        |SELECT CAST(tb.bucket AS BIGINT) AS bucket,
        |CAST(sum(tb.n_tok) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_tokens,
        |CAST(sum(coalesce(fb.n_new, 0)) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_vocab
        |FROM tb LEFT JOIN fb ON fb.bucket = tb.bucket""".stripMargin,
    // the declared sentence/syllable heuristics, banded on the ROUNDED
    // score so the cut line is stable on both sides
    "q_readability" ->
      """WITH f AS (SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS BIGINT) AS n_words,
        |greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sentences,
        |CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |FROM documents),
        |s AS (SELECT doc_id, n_words, n_sentences, n_syllables,
        |CASE WHEN n_words > 0 THEN round(206.835
        |- 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |- 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 4) END AS flesch
        |FROM f)
        |SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
        |CASE WHEN flesch IS NULL THEN 'empty'
        |WHEN flesch >= 70.0 THEN 'easy'
        |WHEN flesch >= 50.0 THEN 'standard'
        |WHEN flesch >= 30.0 THEN 'difficult'
        |ELSE 'very_difficult' END AS band FROM s""".stripMargin,
    // Same rounded-PMI ordering + (tok_a, tok_b) tie-break as the engine,
    // so the top-k cut line is deterministic on both sides.
    "q_pmi" ->
      """WITH tk AS (SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '') AS toks FROM documents),
        |uni AS (SELECT t AS token, count(*) AS n_uni FROM
        |(SELECT unnest(toks) AS t FROM tk) u GROUP BY t),
        |bi AS (SELECT p['a'] AS tok_a, p['b'] AS tok_b, count(*) AS n_ab FROM
        |(SELECT unnest(list_transform(range(1, len(toks)),
        |i -> {'a': toks[i], 'b': toks[i+1]})) AS p FROM tk WHERE len(toks) >= 2) v
        |GROUP BY 1, 2),
        |tot AS (SELECT (SELECT CAST(sum(n_uni) AS DOUBLE) FROM uni) AS n_total,
        |(SELECT CAST(sum(n_ab) AS DOUBLE) FROM bi) AS b_total)
        |SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
        |round(ln((CAST(n_ab AS DOUBLE) / b_total) /
        |((CAST(n_a AS DOUBLE) / n_total) * (CAST(n_b AS DOUBLE) / n_total))), 6) AS pmi
        |FROM (SELECT bi.tok_a, bi.tok_b, bi.n_ab, ua.n_uni AS n_a, ub.n_uni AS n_b
        |FROM bi JOIN uni ua ON ua.token = bi.tok_a JOIN uni ub ON ub.token = bi.tok_b
        |WHERE bi.n_ab >= 5) j, tot
        |ORDER BY pmi DESC, tok_a ASC, tok_b ASC LIMIT 50""".stripMargin,
    // Pooled two-proportion z; variant = user_id % 2; conversion =
    // MORE THAN 13 'purchase' events (any-event converts every user on
    // this dense fixture — the threshold splits around the mean).
    "q_abtest" ->
      """WITH per AS (SELECT user_id % 2 AS variant,
        |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 13 AS INT) AS conv
        |FROM events GROUP BY user_id),
        |c AS (SELECT
        |CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |FROM per)
        |SELECT n_a, n_b, conv_a, conv_b,
        |round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
        |round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
        |round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |/ nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |* (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |* (1.0 / n_a + 1.0 / n_b)), 0.0), 6) AS z_score,
        |coalesce(CAST(abs((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |/ nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |* (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |* (1.0 / n_a + 1.0 / n_b)), 0.0)) > 1.96 AS BIGINT), 0) AS significant
        |FROM c""".stripMargin,
    // Interval-overlap join: the oracle is the plain non-equi overlap
    // join (DuckDB plans it as an IEJoin); the engine's binned equi form
    // must produce the identical aggregate. Transit spans synthesize
    // deterministically from (l_orderkey, l_linenumber).
    "q_join_interval" ->
      """WITH p AS (SELECT o_orderkey,
        |date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS p_lo,
        |date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) + 3 AS p_hi
        |FROM orders WHERE o_orderpriority = '1-URGENT'),
        |t AS (SELECT l_quantity,
        |date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) AS t_lo,
        |date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) + 1
        |+ ((l_orderkey * 7 + l_linenumber) % 28) AS t_hi
        |FROM lineitem WHERE l_quantity > 45)
        |SELECT o_orderkey, count(*) AS n_in_transit,
        |CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS qty_in_transit
        |FROM p JOIN t ON p_lo <= t_hi AND t_lo <= p_hi
        |GROUP BY o_orderkey""".stripMargin,
    // ExactSubstr semantics at L=8-gram coverage: a 1-based token
    // position q is removed iff some 8-gram starting in [q-7, q] has
    // corpus-wide occurrence >= 2 (within-doc repeats count). Same
    // 60-bit md5 gram hashes as the Spark side; coverage expanded via
    // range(pos, pos+8) over 1-based starts.
    "q_substring_dedup" -> substringOracleSql("", "documents", ""),
    // the incremental lookup's oracle is the SAME coverage text over
    // the re-keyed union, restricted to delta rows: duplicate totals =
    // index counts + the delta's own counts, exactly what the pruned
    // lookup computes
    "q_substring_dedup_incr" -> substringOracleSql(
      """d AS (SELECT CASE WHEN doc_id % 20 = 0 THEN doc_id + 200000
        |ELSE doc_id END AS doc_id, text FROM documents), """.stripMargin,
      "d", "WHERE t.doc_id >= 200000"),
    // forget: the SAME incremental text with the forgotten corpus docs
    // filtered at the source (the re-keyed delta keeps all its rows)
    "q_substring_forget" -> substringOracleSql(
      """d AS (SELECT CASE WHEN doc_id % 20 = 0 THEN doc_id + 200000
        |ELSE doc_id END AS doc_id, text FROM documents
        |WHERE doc_id % 20 = 0 OR doc_id % 17 <> 0), """.stripMargin,
      "d", "WHERE t.doc_id >= 200000"),
    // Winnowing: k=4 token grams, w=5 window minima, 60-bit md5 hashes
    // (the md5-hex spelling Md5Bits is bit-identical to), df cap 50,
    // pairs sharing >= 2 fingerprints.
    "q_winnow" -> winnowOracleSql("", "documents", "a.doc_id < b.doc_id"),
    // the incremental lookup's oracle is the SAME winnow text over the
    // re-keyed union, restricted to delta x corpus cross pairs (the df
    // cap counts the union — exactly what the pruned-partition lookup
    // computes, since a fingerprint's whole history lives in one bkt)
    "q_winnow_incr" -> winnowOracleSql(
      """d AS (SELECT CASE WHEN doc_id % 20 = 0 THEN doc_id + 100000
        |ELSE doc_id END AS doc_id, text FROM documents), """.stripMargin,
      "d", "a.doc_id >= 100000 AND b.doc_id < 100000"),
    // forget: the SAME incremental text with the forgotten corpus docs
    // (doc_id % 17 = 0 on the index side; the re-keyed delta keeps all
    // its rows) filtered at the source — they must neither pair nor
    // count toward the df cap
    "q_winnow_forget" -> winnowOracleSql(
      """d AS (SELECT CASE WHEN doc_id % 20 = 0 THEN doc_id + 100000
        |ELSE doc_id END AS doc_id, text FROM documents
        |WHERE doc_id % 20 = 0 OR doc_id % 17 <> 0), """.stripMargin,
      "d", "a.doc_id >= 100000 AND b.doc_id < 100000"),
    // Bigram-LM perplexity: add-0.1 smoothing, en-trained, <unk> OOV
    // mapping; tr's range runs one past the end so unigram counts cover
    // the last position (toks[i+1] out of bounds -> NULL successor).
    // the incremental form folds persisted count partials over the same
    // en train slice — additivity makes the SAME batch LM its ground truth
    "q_ngram_lm_incr" -> NgramLmOracleSql,
    // forget: the SAME LM text trained AND scored over survivors only
    // (victims leave the counts and the vocabulary)
    "q_lm_forget" -> ngramLmOracleSqlOver("WHERE doc_id % 17 <> 0"),
    // drift-vs-index: P is the index content law (unigram counts over
    // ALL en docs — base written + delta appended), Q is the delta
    // shard's own counts; one full-outer token join, the same JS
    // spelling as q_source_drift, js_bits from the UNROUNDED nats
    "q_drift_incr" ->
      """WITH ptok AS (SELECT t AS token, count(*) AS np FROM
        |(SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents WHERE lang = 'en') u WHERE t <> '' GROUP BY t),
        |qtok AS (SELECT t AS token, count(*) AS nq FROM
        |(SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
        |FROM documents WHERE lang = 'en' AND doc_id % 20 = 0) u
        |WHERE t <> '' GROUP BY t),
        |tp AS (SELECT CAST(sum(np) AS BIGINT) AS n_base,
        |CAST(count(*) AS BIGINT) AS n_base_types FROM ptok),
        |tq AS (SELECT CAST(sum(nq) AS BIGINT) AS n_delta,
        |CAST(count(*) AS BIGINT) AS n_delta_types FROM qtok),
        |j AS (SELECT np, nq, coalesce(np, 0) AS np0, coalesce(nq, 0) AS nq0
        |FROM ptok FULL JOIN qtok USING (token)),
        |s AS (SELECT
        |CAST(sum(CASE WHEN np IS NOT NULL AND nq IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |AS n_common_types,
        |sum(((CAST(np0 AS DOUBLE)/n_base + CAST(nq0 AS DOUBLE)/n_delta)/2)
        |* ln((CAST(np0 AS DOUBLE)/n_base + CAST(nq0 AS DOUBLE)/n_delta)/2)) AS mlnm,
        |sum(CASE WHEN np IS NOT NULL
        |THEN (CAST(np AS DOUBLE)/n_base)*ln(CAST(np AS DOUBLE)/n_base) ELSE 0 END) AS plnp,
        |sum(CASE WHEN nq IS NOT NULL
        |THEN (CAST(nq AS DOUBLE)/n_delta)*ln(CAST(nq AS DOUBLE)/n_delta) ELSE 0 END) AS qlnq
        |FROM j, tp, tq)
        |SELECT tp.n_base, tq.n_delta, tp.n_base_types, tq.n_delta_types,
        |s.n_common_types,
        |round(-(s.mlnm) + (s.plnp + s.qlnq)/2, 6) AS js_nats,
        |round((-(s.mlnm) + (s.plnp + s.qlnq)/2) / ln(2), 6) AS js_bits
        |FROM s, tp, tq""".stripMargin,
    // KS over the (slice, n_chars) count grid: every pair sees the
    // union of x values (absent side 0), CDFs via one window per pair,
    // reject boolean on the ROUNDED statistic and threshold
    "q_ks_test" ->
      """WITH vx AS (SELECT source AS slice, n_chars AS x, count(*) AS c
        |FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |sz AS (SELECT slice, CAST(sum(c) AS BIGINT) AS n FROM vx GROUP BY slice),
        |pr AS (SELECT least(v.slice, o.slice) AS slice_a,
        |greatest(v.slice, o.slice) AS slice_b, v.x,
        |sum(CASE WHEN v.slice < o.slice THEN v.c ELSE 0 END) AS ca,
        |sum(CASE WHEN v.slice > o.slice THEN v.c ELSE 0 END) AS cb
        |FROM vx v JOIN sz o ON v.slice <> o.slice GROUP BY 1, 2, 3),
        |cum AS (SELECT slice_a, slice_b, x,
        |sum(ca) OVER (PARTITION BY slice_a, slice_b ORDER BY x) AS cum_a,
        |sum(cb) OVER (PARTITION BY slice_a, slice_b ORDER BY x) AS cum_b FROM pr),
        |d AS (SELECT c.slice_a, c.slice_b, za.n AS n_a, zb.n AS n_b,
        |max(abs(CAST(cum_a AS DOUBLE)/za.n - CAST(cum_b AS DOUBLE)/zb.n)) AS d
        |FROM cum c JOIN sz za ON za.slice = c.slice_a
        |JOIN sz zb ON zb.slice = c.slice_b GROUP BY 1, 2, 3, 4)
        |SELECT slice_a, slice_b, n_a, n_b, round(d, 6) AS ks_stat,
        |round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)/CAST(n_a * n_b AS DOUBLE)), 6)
        |AS ks_crit_05,
        |round(d, 6) >
        |round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)/CAST(n_a * n_b AS DOUBLE)), 6)
        |AS differs FROM d""".stripMargin,
    // CCNet buckets: the LM oracle wrapped in rank terciles (ntile on
    // the 6-dp grid, doc_id tie-break) + per-bucket summary
    "q_ccnet_buckets" ->
      s"""WITH lm AS ($NgramLmOracleSql),
        |b AS (SELECT lang, logppl, n_bigrams,
        |CASE ntile(3) OVER (PARTITION BY lang ORDER BY logppl ASC, doc_id ASC)
        |WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket FROM lm)
        |SELECT lang, bucket, count(*) AS n_docs,
        |min(logppl) AS lo_logppl, max(logppl) AS hi_logppl,
        |CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams
        |FROM b GROUP BY lang, bucket""".stripMargin,
    "q_ngram_lm" -> NgramLmOracleSql,
    // Kneser-Ney: d=0.75 absolute discount, continuation unigram with
    // add-one mass, unseen context backs off to Pc entirely; one fixed
    // association order so each double op is identical IEEE
    "q_kneser_ney" -> KneserNeyOracleSql,
    // the index-read KN twin shares the batch KN oracle outright
    // (count additivity over doc-complete batches)
    "q_kneser_ney_incr" -> KneserNeyOracleSql,
    // Linear quality classifier: 1024 hashed buckets, integer-milli
    // weights wm = md5_60('w:'||bucket) % 2001 - 1000; the per-doc sum
    // is exact integer arithmetic, one double division at the end.
    "q_quality_clf" ->
      """WITH w AS (SELECT j AS bucket,
        |CAST(('0x'||substr(md5('w:'||j),1,15)) AS BIGINT) % 2001 - 1000 AS wm
        |FROM (SELECT unnest(range(0, 1024)) AS j) z),
        |tk AS (SELECT doc_id,
        |CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % 1024 AS bucket FROM
        |(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS tok FROM documents) u)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(sum(wm) AS DOUBLE) / (count(*) * 1000.0) AS logit,
        |CAST(sum(wm) >= 0 AS BIGINT) AS keep
        |FROM tk JOIN w USING (bucket) GROUP BY doc_id""".stripMargin,
    // grouped Mann-Whitney: u2 = Σ_g pos_g·(2·cum_neg_below + neg_g)
    // (×2 keeps the ½ tie credit integral); scores on the 6-dp grid
    "q_auc" ->
      """WITH w AS (SELECT j AS bucket,
        |CAST(('0x'||substr(md5('w:'||j),1,15)) AS BIGINT) % 2001 - 1000 AS wm
        |FROM (SELECT unnest(range(0, 1024)) AS j) z),
        |tk AS (SELECT doc_id,
        |CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % 1024 AS bucket FROM
        |(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS tok FROM documents) u),
        |sc AS (SELECT doc_id, CAST(sum(wm) AS DOUBLE) / (count(*) * 1000.0) AS logit
        |FROM tk JOIN w USING (bucket) GROUP BY doc_id),
        |lab AS (SELECT s.logit AS score,
        |CAST(coalesce(d.lang = 'en', FALSE) AS BIGINT) AS label
        |FROM sc s JOIN documents d ON d.doc_id = s.doc_id),
        |g AS (SELECT score, sum(label) AS pos, sum(1 - label) AS neg FROM lab GROUP BY score),
        |c AS (SELECT pos, neg, coalesce(sum(neg) OVER (ORDER BY score ASC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg FROM g)
        |SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
        |CAST(sum(pos * (2*cum_neg + neg)) AS BIGINT) AS u2,
        |CASE WHEN sum(pos) * sum(neg) = 0 THEN NULL
        |ELSE round(CAST(sum(pos * (2*cum_neg + neg)) AS DOUBLE) / (2.0 * sum(pos) * sum(neg)), 6)
        |END AS auc FROM c""".stripMargin,
    // the fixed-1024-bin histogram form: bin = ⌊(logit+1)·512⌋ clamped,
    // same fold over the bounded bin table
    "q_auc_binned" ->
      """WITH w AS (SELECT j AS bucket,
        |CAST(('0x'||substr(md5('w:'||j),1,15)) AS BIGINT) % 2001 - 1000 AS wm
        |FROM (SELECT unnest(range(0, 1024)) AS j) z),
        |tk AS (SELECT doc_id,
        |CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % 1024 AS bucket FROM
        |(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS tok FROM documents) u),
        |sc AS (SELECT doc_id, CAST(sum(wm) AS DOUBLE) / (count(*) * 1000.0) AS logit
        |FROM tk JOIN w USING (bucket) GROUP BY doc_id),
        |lab AS (SELECT least(1023, CAST(floor((s.logit + 1.0) * 512.0) AS BIGINT)) AS bin,
        |CAST(coalesce(d.lang = 'en', FALSE) AS BIGINT) AS label
        |FROM sc s JOIN documents d ON d.doc_id = s.doc_id),
        |g AS (SELECT bin, sum(label) AS pos, sum(1 - label) AS neg FROM lab GROUP BY bin),
        |c AS (SELECT pos, neg, coalesce(sum(neg) OVER (ORDER BY bin ASC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg FROM g)
        |SELECT CAST(count(*) AS BIGINT) AS n_bins_used,
        |CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
        |CAST(sum(pos * (2*cum_neg + neg)) AS BIGINT) AS u2,
        |CASE WHEN sum(pos) * sum(neg) = 0 THEN NULL
        |ELSE round(CAST(sum(pos * (2*cum_neg + neg)) AS DOUBLE) / (2.0 * sum(pos) * sum(neg)), 6)
        |END AS auc_binned FROM c""".stripMargin,
    // PR sweep: tp/fp are DESCENDING running sums over the grouped
    // score table; fn = P - tp; one rounded division per metric
    "q_pr_curve" ->
      """WITH w AS (SELECT j AS bucket,
        |CAST(('0x'||substr(md5('w:'||j),1,15)) AS BIGINT) % 2001 - 1000 AS wm
        |FROM (SELECT unnest(range(0, 1024)) AS j) z),
        |tk AS (SELECT doc_id,
        |CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % 1024 AS bucket FROM
        |(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS tok FROM documents) u),
        |sc AS (SELECT doc_id, CAST(sum(wm) AS DOUBLE) / (count(*) * 1000.0) AS logit
        |FROM tk JOIN w USING (bucket) GROUP BY doc_id),
        |lab AS (SELECT s.logit AS threshold,
        |CAST(coalesce(d.lang = 'en', FALSE) AS BIGINT) AS label
        |FROM sc s JOIN documents d ON d.doc_id = s.doc_id),
        |g AS (SELECT threshold, sum(label) AS pos, sum(1 - label) AS neg
        |FROM lab GROUP BY threshold),
        |c AS (SELECT threshold,
        |sum(pos) OVER (ORDER BY threshold DESC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
        |sum(neg) OVER (ORDER BY threshold DESC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
        |sum(pos) OVER () - sum(pos) OVER (ORDER BY threshold DESC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fn FROM g)
        |SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |CAST(fn AS BIGINT) AS fn,
        |round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS "precision",
        |CASE WHEN tp + fn = 0 THEN NULL
        |ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
        |round(2.0 * tp / CAST(2*tp + fp + fn AS DOUBLE), 6) AS f1
        |FROM c""".stripMargin,
    // ECE: integer-micro confidences p_micro = ⌊(swm+1000n)·10⁶/(2000n)⌋,
    // 10 equal-width bins, gap |10⁶·Σlabel − Σp_micro| stays integral
    "q_ece" ->
      """WITH w AS (SELECT j AS bucket,
        |CAST(('0x'||substr(md5('w:'||j),1,15)) AS BIGINT) % 2001 - 1000 AS wm
        |FROM (SELECT unnest(range(0, 1024)) AS j) z),
        |tk AS (SELECT doc_id,
        |CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % 1024 AS bucket FROM
        |(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS tok FROM documents) u),
        |sc AS (SELECT doc_id,
        |CAST((sum(wm) + 1000*count(*)) * 1000000 // (2000*count(*)) AS BIGINT) AS p_micro
        |FROM tk JOIN w USING (bucket) GROUP BY doc_id),
        |lab AS (SELECT least(9, p_micro // 100000) AS bin,
        |CAST(coalesce(d.lang = 'en', FALSE) AS BIGINT) AS label, p_micro
        |FROM sc s JOIN documents d ON d.doc_id = s.doc_id),
        |g AS (SELECT bin, count(*) AS n, sum(label) AS s_label,
        |sum(p_micro) AS s_conf FROM lab GROUP BY bin)
        |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        |CAST(count(*) AS BIGINT) AS n_bins_used,
        |CAST(sum(abs(1000000*s_label - s_conf)) AS BIGINT) AS gap_sum,
        |round(CAST(sum(abs(1000000*s_label - s_conf)) AS DOUBLE) / (1000000.0 * sum(n)), 6) AS ece
        |FROM g""".stripMargin,
    // Spearman: clf CTE + the full LM oracle nested as a CTE (the
    // q_tokenize_pack WITH-nesting trick); LM rank orders logppl ASC
    // (high perplexity = bad) so rho > 0 means agreement
    "q_rank_corr" ->
      ("""WITH clf AS (
        |WITH w AS (SELECT j AS bucket,
        |CAST(('0x'||substr(md5('w:'||j),1,15)) AS BIGINT) % 2001 - 1000 AS wm
        |FROM (SELECT unnest(range(0, 1024)) AS j) z),
        |tk AS (SELECT doc_id,
        |CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % 1024 AS bucket FROM
        |(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS tok FROM documents) u)
        |SELECT doc_id, CAST(sum(wm) AS DOUBLE) / (count(*) * 1000.0) AS logit
        |FROM tk JOIN w USING (bucket) GROUP BY doc_id
        |),
        |lm AS (
        |""".stripMargin + NgramLmOracleSql + """
        |),
        |j AS (SELECT c.doc_id, c.logit, l.logppl FROM clf c JOIN lm l ON l.doc_id = c.doc_id),
        |r AS (SELECT doc_id,
        |row_number() OVER (ORDER BY logit DESC, doc_id ASC) AS r_clf,
        |row_number() OVER (ORDER BY logppl ASC, doc_id ASC) AS r_lm FROM j)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |CAST(sum((r_clf - r_lm)*(r_clf - r_lm)) AS BIGINT) AS sum_d2,
        |CASE WHEN count(*) < 2 THEN NULL ELSE
        |round(1.0 - 6.0 * CAST(sum((r_clf - r_lm)*(r_clf - r_lm)) AS DOUBLE)
        |/ CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE), 6) END AS spearman_rho
        |FROM r""".stripMargin),
    // MaxSim: identical md5-derived token vectors, per-term max dots
    "q_maxsim" -> MaxSimOracleSql,
    // Brier: exact squared micro gaps, one scalar fold
    "q_brier" ->
      """WITH w AS (SELECT j AS bucket,
        |CAST(('0x'||substr(md5('w:'||j),1,15)) AS BIGINT) % 2001 - 1000 AS wm
        |FROM (SELECT unnest(range(0, 1024)) AS j) z),
        |tk AS (SELECT doc_id,
        |CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) % 1024 AS bucket FROM
        |(SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |x -> x <> '')) AS tok FROM documents) u),
        |sc AS (SELECT doc_id,
        |CAST((sum(wm) + 1000*count(*)) * 1000000 // (2000*count(*)) AS BIGINT) AS p_micro
        |FROM tk JOIN w USING (bucket) GROUP BY doc_id),
        |g AS (SELECT 1000000 * CAST(coalesce(d.lang = 'en', FALSE) AS BIGINT)
        |- p_micro AS gap FROM sc s JOIN documents d ON d.doc_id = s.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(sum(gap * gap) AS BIGINT) AS sq_sum,
        |round(CAST(sum(gap * gap) AS DOUBLE) / (1000000000000.0 * count(*)), 6) AS brier
        |FROM g""".stripMargin,
    // Temperature sampling: rate_s = sqrt(n_min / n_s) — one IEEE
    // division + one correctly-rounded sqrt per stratum, so the
    // millionths thresholds are bit-identical across engines (no
    // order-sensitive normalizing sum anywhere).
    // DP release: identical seeded uniform, identical inverse-CDF
    // spelling, round-6 declared grid for the one libm ln
    "q_dp_release" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |WHERE lang IS NOT NULL GROUP BY lang),
        |u AS (SELECT lang, n,
        |(CAST(CAST(('0x'||substr(md5('dp:r13:'||lang),1,15)) AS BIGINT) % 1000000 AS DOUBLE) + 0.5)
        |/ 1000000.0 AS uu FROM c)
        |SELECT lang,
        |round(n + (CASE WHEN uu >= 0.5 THEN -1.0 ELSE 1.0 END
        |* ln(1.0 - 2.0*abs(uu - 0.5))) / 1.0, 6) AS released,
        |1.0 AS epsilon FROM u""".stripMargin,
    "q_sample_temp" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |WHERE lang IS NOT NULL GROUP BY lang),
        |m AS (SELECT min(n) AS n_min FROM c),
        |thr AS (SELECT lang,
        |CAST(round(sqrt(CAST(n_min AS DOUBLE) / n) * 1000000) AS BIGINT) AS t
        |FROM c, m)
        |SELECT d.lang, count(*) AS n_docs,
        |CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |WHERE CAST(('0x'||substr(md5('strat:' || d.lang || ':' || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |% 1000000 < t
        |GROUP BY d.lang""".stripMargin,
    // Top-k aggregate: the oracle is the rank-filter spelling with the
    // identical deterministic tie-break (score desc, key asc).
    "q_topk_agg" ->
      """SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY o_orderpriority
        |ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |FROM orders) z WHERE rnk <= 3""".stripMargin
  )
}
