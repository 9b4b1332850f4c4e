package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The composed cleaning pipeline — the thing a user of this engine
  * actually RUNS over a raw crawl before training: language filter →
  * quality thresholds → repetition filter → exact dedup (keep first
  * occurrence) → benchmark decontamination. Each stage reuses the
  * corresponding declared operator's own logic, so the pipeline is the
  * composition surface over [[TextOps]] / [[Dedup]], not a re-
  * implementation.
  *
  * Every document is attributed to its FIRST failing stage (stages
  * ordered cheap-to-expensive, the order a real pipeline short-circuits
  * in), which makes the output the per-stage rejection report data
  * engineers read to tune thresholds.
  */
object Cleaning {

  /** Declared query q_corpus_clean: docs 0–49 are the eval benchmark
    * (the same split q_decontaminate declares); the remaining corpus is
    * cleaned and reported as one row per rejection reason (+ 'keep')
    * with document and char counts.
    *
    * Scale shape (round-9 fusion, completed round 11): EVERY stage
    * signal — quality keep, duplicate-n-gram fraction, top-token
    * concentration (max equal-run of the row's sorted token array),
    * the containment check (in-row merge-intersect against the one-row
    * broadcast eval-shingle array), and the dup-rank norm-hash — comes
    * out of ONE pass over the corpus via shared column expressions
    * (parity with the standalone operators is spec-pinned), so the
    * text is scanned, trimmed, tokenized and regexed once instead of
    * once per stage (the previous shapes re-scanned the corpus for the
    * top-token aggregate and contamination's shingle explode — read
    * amplification a 100 TB crawl pays in full). The ONLY remaining
    * corpus exchange is the dup rank's window min over the norm-hash
    * (narrow verdict columns, no self-join, never the text) feeding
    * the final reason aggregate; nothing here is all-pairs. */
  def corpusCleanQ(spark: SparkSession, dir: String): DataFrame =
    cleanVerdicts(spark, dir)
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))

  /** The per-document first-failing-stage verdict frame behind
    * [[corpusCleanQ]] — (doc_id, n_chars, reason) — exposed so the
    * end-to-end pipeline ([[e2eCorpusQ]]) can consume the keep set
    * downstream instead of re-deriving the stages. */
  private[ops] def cleanVerdicts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    cleanVerdictsOf(docs.filter(col("doc_id") < 50),
      docs.filter(col("doc_id") >= 50))
  }

  /** [[cleanVerdicts]] over explicit eval/corpus frames — the ScaleSmoke
    * amplification entry point (per-copy eval splits keep contamination
    * rates constant per unit input). */
  private[graft] def cleanVerdictsOf(evalDocs: DataFrame,
      corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession

    // top-token concentration IN-ROW (round-11 fusion): the per-(doc,
    // token) aggregate chain the standalone operator uses is the right
    // shape when the signal is consumed alone, but inside the composed
    // pipeline it cost two extra exchanges plus a doc-keyed join for
    // one number per doc. A document's tokens already live in its row,
    // so max token multiplicity = the longest equal-run of the row's
    // SORTED token array — O(n log n) per row, zero shuffles, and the
    // memory bound (one doc's tokens) is the same bound holding the
    // text column itself. CleaningSpec pins parity with
    // TextOps.repetitionScores' aggregate-computed fraction.
    val toksNE = filter(TextOps.toks(col("text")), t => t =!= "")
    val bestRun = aggregate(sort_array(col("__toks")),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val newRun = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), newRun.as("run"),
          greatest(acc("best"), newRun).as("best"))
      },
      acc => acc("best"))
    // contamination IN-ROW (round-11 fusion): the standalone operator's
    // broadcast-semi-join form re-scans and re-shingles the corpus for
    // one boolean per doc. Here the doc's sorted distinct shingle array
    // rides the same per-row pass and merge-intersects (native
    // SortedLongIntersectCount, O(|doc| + |eval|) per row) against the
    // ONE-ROW broadcast eval-shingle array. Right while the eval
    // benchmark is bounded (the same boundedness the broadcast
    // semi-join rests on); for an eval set big enough that per-row
    // O(|eval|) hurts, compose Dedup.contamination's join form instead.
    graft.functions.SortedLongIntersectCount.register(spark)
    val evalRow = Dedup.evalShingleRow(evalDocs)

    // one per-row pass: every map-side signal from a single tokenize
    val perRow = Tables.fanout(corpus)
      .crossJoin(broadcast(evalRow))
      .select(col("doc_id"), col("lang"), col("eval_sh"),
        length(col("text")).cast("long").as("n_chars"),
        TextOps.qualityKeepExpr(col("text")).as("q_keep"),
        TextOps.dupGramFrac(TextOps.toks(col("text")), 2).as("dup_2gram_frac"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("norm_hash"),
        toksNE.as("__toks"),
        Dedup.shingleArrayExpr(col("text"), 8, spark).as("__sh"))
      .withColumn("top_token_frac",
        when(size(col("__toks")) > 0,
          bestRun.cast("double") / size(col("__toks"))))
      .withColumn("is_contam", size(col("__sh")) > 0 &&
        expr("sorted_intersect_count(__sh, eval_sh)").cast("double") /
          size(col("__sh")) >= 0.05)
      .drop("__toks", "__sh", "eval_sh")
      .withColumn("first_id", min(col("doc_id")).over(Window.partitionBy(col("norm_hash"))))
      .withColumn("is_dup", col("doc_id") =!= col("first_id"))

    perRow
      // docs with zero non-empty tokens keep a null r_keep (the old
      // left-joined aggregate frame had no row either) and the
      // verdict's coalesce defaults it to keep
      .withColumn("r_keep", when(col("top_token_frac").isNotNull,
        (col("top_token_frac") < 0.2 && col("dup_2gram_frac") < 0.2).cast("long")))
      .select(col("doc_id"), col("n_chars"),
        when(col("lang") =!= "en", lit("lang"))
          .when(col("q_keep") === 0L, lit("quality"))
          .when(coalesce(col("r_keep"), lit(1L)) === 0L, lit("repetition"))
          .when(col("is_dup"), lit("duplicate"))
          .when(col("is_contam"), lit("contaminated"))
          .otherwise(lit("keep")).as("reason"))
  }

  /** Deterministic HTML page per document — the synthesized-structure
    * convention ([[TextOps.redactQ]]/[[TextOps.c4FiltersQ]] precedent):
    * the fixture corpus is plain word soup, so the query first WRAPS
    * each document in the page chrome a crawl actually delivers (head
    * with title/script/style, nav bar, 8-token `<p>` paragraphs, a
    * tracking comment on every 7th doc, an inline analytics script on
    * every 5th, a copyright footer), all pure functions of (doc_id,
    * tokens) and identically spelled in the oracle. Single-line by
    * construction (tokens carry no whitespace), so the non-greedy
    * block regexes need no DOTALL on either engine. */
  private[graft] def synthesizedHtml(docs: DataFrame): DataFrame = {
    val toksA = filter(TextOps.toks(col("text")), t => t =!= "")
    val nPars = ceil(size(col("__toks")).cast("double") / 8.0).cast("int")
    val pars = when(size(col("__toks")) > 0,
      transform(sequence(lit(0), nPars - 1), i =>
        concat(lit("<p>"),
          concat_ws(" ", slice(col("__toks"), i * 8 + 1, lit(8))),
          lit("</p>"))))
      .otherwise(array().cast("array<string>"))
    val id = col("doc_id").cast("string")
    Tables.fanout(docs)
      .withColumn("__toks", toksA)
      .withColumn("__pars", pars)
      .select(col("doc_id"), col("lang"),
        concat(
          lit("<html><head><title>Doc "), id,
          lit("</title><script>var x = "), id,
          lit(";</script><style>body { color: red; }</style></head>" +
            "<body><div class=\"nav\">home | about | contact</div>"),
          concat_ws("", col("__pars")),
          when(col("doc_id") % 7 === 0,
            concat(lit("<!-- tracking beacon "), id, lit(" -->")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit("<script>analytics.track(\""), id,
              lit("\");</script>"))).otherwise(lit("")),
          lit("<div class=\"footer\">copyright example corp all rights " +
            "reserved</div></body></html>")).as("html"))
  }

  /** HTML → clean text extraction (q_html_extract) — the stage every
    * CommonCrawl-descended corpus runs FIRST, before lang-id / quality
    * / dedup ever see a byte (the round-15 verdict's one missing
    * high-frequency LLM-pipeline operator). Declared heuristics,
    * mirrored regex-for-regex in the oracle:
    *
    *  1. drop `<script>…</script>`, `<style>…</style>` blocks and
    *     `<!-- … -->` comments (non-greedy, single-line pages);
    *  2. block-element closers (`</p> </div> </title> </h1..6>`)
    *     become line breaks — the block-text reassembly;
    *  3. every remaining tag is stripped;
    *  4. per line: whitespace-collapse + trim, then BOILERPLATE-line
    *     removal — a line survives only if it is non-empty, has ≥ 3
    *     words, and contains neither "copyright" nor a '|' (nav
    *     separators);
    *  5. kept lines reassemble into the extracted text.
    *
    * Output: (doc_id, html_chars, n_lines, n_kept, text_extracted,
    * text_chars).
    *
    * Scale shape: pure per-row codegen string expressions end-to-end —
    * one scan, zero shuffles, zero UDFs; the 100 TB form is
    * embarrassingly parallel, the same posture as [[TextOps
    * .c4FiltersQ]] (which runs AFTER this stage on the extracted
    * text). */
  private[graft] def htmlExtract(pages: DataFrame): DataFrame = {
    val flat =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(col("html"),
          lit("<script[^>]*>.*?</script>"), lit(" ")),
        lit("<style[^>]*>.*?</style>"), lit(" ")),
        lit("<!--.*?-->"), lit(" ")),
        lit("</(p|div|title|h[1-6])>"), lit("@@L@@")),
        lit("<[^>]*>"), lit(" "))
    val keepLine = (l: org.apache.spark.sql.Column) =>
      l =!= "" && !l.contains("copyright") && !l.contains("|") &&
        size(split(l, " ")) >= 3
    pages
      .withColumn("__lines",
        transform(split(flat, "@@L@@", -1),
          l => trim(regexp_replace(l, "\\s+", " "))))
      .select(col("doc_id"),
        length(col("html")).cast("long").as("html_chars"),
        size(filter(col("__lines"), l => l =!= ""))
          .cast("long").as("n_lines"),
        filter(col("__lines"), keepLine).as("__kept"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("text_extracted", concat_ws(" ", col("__kept")))
      .withColumn("text_chars",
        length(col("text_extracted")).cast("long"))
      .select("doc_id", "html_chars", "n_lines", "n_kept",
        "text_extracted", "text_chars")
  }

  def htmlExtractQ(docs: DataFrame): DataFrame =
    htmlExtract(synthesizedHtml(docs))

  /** Declared query q_e2e_corpus — the WHOLE training-data pipeline as
    * ONE declared DAG, the artifact a data team actually ships:
    *
    *   clean (lang → quality → repetition) → dedup (exact, then
    *   MinHash near-dup) → decontaminate → substring-excise the
    *   survivors → BPE-tokenize → pack to the token budget → shard,
    *
    * with every dropped document attributed to its FIRST failing stage
    * and the kept corpus emitted as the per-shard packing manifest.
    * Stage logic is the declared operators' own ([[cleanVerdicts]],
    * [[Dedup.nearDupPairs]], [[Dedup.substringDedup]],
    * [[graft.ops.Bpe]] train/encode, [[Sampling.packSequencesOn]]) —
    * this query is the composition surface, not a re-implementation.
    *
    * Semantics pinned by the oracle:
    *  - near-dup victims are pair RIGHT sides (doc_b at Jaccard ≥ 0.5;
    *    the lower id survives), checked after exact dedup and before
    *    contamination in the first-fail order;
    *  - the boilerplate gram table (occurrence ≥ 2) is computed over
    *    the KEEP set — post-dedup, the order a real pipeline runs
    *    excision in;
    *  - the BPE tokenizer (k = 6 merges) trains on the RAW corpus (the
    *    q_tokenize_pack model — tokenizer induction precedes
    *    filtering) and is APPLIED to the cleaned survivors' excised
    *    text; a doc whose every token was excised packs nothing;
    *  - packing (budget 512) and sharding (md5 mod 16) are the
    *    q_tokenize_pack/q_pack spellings verbatim.
    *
    * Output: one row per drop reason (stage = 'drop', n_docs, total =
    * chars dropped) plus one row per shard (stage = 'pack', n_docs,
    * total = encoded tokens, n_seqs, last_seq).
    *
    * Scale shape: the composition adds NO new shuffle class — each
    * stage keeps its own audited plan (one corpus pass for the clean
    * signals, band-keyed LSH never all-pairs, gram-hash shuffle for
    * excision, vocab-bounded broadcast for encode, one shard-keyed
    * window for packing); the keep-set joins are doc-keyed and
    * filter-reduced. First-fail short-circuiting means the expensive
    * stages only ever see survivors. */
  def e2eCorpusQ(spark: SparkSession, dir: String): DataFrame =
    e2eCorpusOf(Tables.documents(spark, dir), col("doc_id") < 50)

  /** [[e2eCorpusQ]] over an explicit documents frame with an explicit
    * eval-split predicate — the ScaleSmoke amplification entry point. */
  private[graft] def e2eCorpusOf(docs: DataFrame, evalPred: org.apache.spark.sql.Column): DataFrame = {
    val spark = docs.sparkSession
    val corpus = docs.filter(!evalPred)
    val verdicts = PipelineCaches.track(
      cleanVerdictsOf(docs.filter(evalPred), corpus))
    // near-dup stage: refine docs that PASSED lang/quality/repetition/
    // exact-dup (reason keep or contaminated — contamination is checked
    // after near-dup in the first-fail order)
    val victims = Dedup.nearDupPairs(corpus)
      .select(col("doc_b").as("doc_id")).distinct()
    val staged = PipelineCaches.track(verdicts
      .join(victims.withColumn("is_nd", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        when(col("reason").isin("keep", "contaminated") && col("is_nd"),
          lit("near_duplicate")).otherwise(col("reason")).as("reason")))
    val drops = staged.filter(col("reason") =!= "keep")
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total"))
      .select(lit("drop").as("stage"), col("reason").as("key"),
        col("n_docs"), col("total"),
        lit(null).cast("long").as("n_seqs"), lit(null).cast("long").as("last_seq"))
    // survivors: substring-excised text, encoded under the raw-corpus
    // BPE model, packed and sharded
    val keepers = corpus.join(
      staged.filter(col("reason") === "keep").select("doc_id"), Seq("doc_id"), "left_semi")
    val cleaned = Dedup.substringDedup(keepers)
      .select(col("doc_id"), col("clean_text").as("text"))
    val encLens = graft.ops.Bpe.encodedLengths(docs, cleaned, k = 6)
    val packs = Sampling.packSequencesOn(encLens, col("enc_len"), 512)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total"),
        count_distinct(col("bin")).as("n_seqs"), max(col("bin")).as("last_seq"))
      .select(lit("pack").as("stage"), col("shard").cast("string").as("key"),
        col("n_docs"), col("total"), col("n_seqs"), col("last_seq"))
    drops.unionByName(packs)
  }

  /** Declared query q_e2e_corpus_incr — the STEADY-STATE form of
    * [[e2eCorpusQ]], the artifact a production crawl actually runs: a
    * new shard (doc_id % 20 = 0) arrives and emits the same drop/pack
    * report for the delta only, riding three persisted artifacts built
    * once over the base crawl (doc_id % 20 ≠ 0):
    *
    *  - the MinHash near-dup inverted file (q_dedup_incr's index) —
    *    cross near-dups via the bucket-pruned [[Dedup.nearDupsAgainstIndex]]
    *    lookup; a delta doc pairing with ANY base doc yields (the base
    *    is already shipped), within-delta pairs keep the batch
    *    higher-id-yields rule;
    *  - the substring gram-frequency index (q_substring_dedup_incr's) —
    *    boilerplate totals = base gram counts + the delta survivors'
    *    own, excision via [[Dedup.substringDedupAgainstIndex]];
    *  - the frozen BPE encoder ([[Bpe.writeEncoder]]) — the tokenizer
    *    is induced on the base crawl once and APPLIED to every later
    *    shard (vocab-bounded broadcast; an OOV word contributes
    *    nothing, the declared convention).
    *
    * Attribution-order deltas vs the batch form, both forced by
    * incrementality: 'duplicate' covers only WITHIN-shard exact dups
    * (a delta text exactly duplicating a base doc is caught as
    * 'near_duplicate' — identical token sets share every band, so the
    * index lookup reports it at Jaccard 1.0; the batch corpus-wide
    * norm-hash window would need a base re-scan), and the tokenizer is
    * base-trained rather than raw-union-trained.
    *
    * Scale shape: every delta-time stage is shard-sized or
    * artifact-lookup-sized — per-row clean signals in one delta scan,
    * LSH and gram lookups bucket-pruned above the size gate, the
    * encode table vocab-bounded — and the base DOCUMENTS are never
    * re-read (CleaningSpec pins that structurally: the report's input
    * files exclude the base docs source). Delta cost is therefore
    * independent of how much corpus the loop already shipped. */
  def e2eCorpusIncrQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs
      .filter(col("doc_id") >= 50 && col("doc_id") % 20 =!= 0)
      .select(col("doc_id"), col("text"))
    val ndDir = BuildOnce.tempDirFor("graft_e2e_nd_idx", dir)
    BuildOnce(spark, ndDir, Seq(dir))(Dedup.writeNearDupIndex(base, ndDir))
    val gramDir = BuildOnce.tempDirFor("graft_e2e_gram_idx", dir)
    BuildOnce(spark, gramDir, Seq(dir))(Dedup.writeSubstringIndex(base, gramDir))
    val bpeDir = BuildOnce.tempDirFor("graft_e2e_bpe", dir)
    BuildOnce(spark, bpeDir, Seq(dir))(Bpe.writeEncoder(base, bpeDir, k = 6))
    e2eCorpusIncrOf(docs.filter(col("doc_id") < 50),
      docs.filter(col("doc_id") >= 50 && col("doc_id") % 20 === 0),
      ndDir, gramDir, bpeDir)
  }

  /** [[e2eCorpusIncrQ]]'s delta pass over explicit frames and artifact
    * dirs — the CleaningSpec no-base-rescan entry point. */
  private[graft] def e2eCorpusIncrOf(evalDocs: DataFrame, deltaIn: DataFrame,
      ndDir: String, gramDir: String, bpeDir: String): DataFrame = {
    val spark = deltaIn.sparkSession
    // one tracked read of the shard: the verdict pass, the LSH lookup's
    // tokens, the keepers join and the excision toks all consume it —
    // untracked, the plan audit showed four shard scans (shard-sized by
    // the micro-batch contract, so caching it is bounded)
    val delta = PipelineCaches.track(deltaIn)
    val verdicts = PipelineCaches.track(cleanVerdictsOf(evalDocs, delta))
    val cross = Dedup.nearDupsAgainstIndex(spark,
      delta.select(col("doc_id"), col("text")), ndDir)
      .select(col("doc_a").as("doc_id"))
    val internal = Dedup.nearDupPairs(delta.select(col("doc_id"), col("text")))
      .select(col("doc_b").as("doc_id"))
    val victims = cross.unionByName(internal).distinct()
    val staged = PipelineCaches.track(verdicts
      .join(victims.withColumn("is_nd", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        when(col("reason").isin("keep", "contaminated") && col("is_nd"),
          lit("near_duplicate")).otherwise(col("reason")).as("reason")))
    val drops = staged.filter(col("reason") =!= "keep")
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total"))
      .select(lit("drop").as("stage"), col("reason").as("key"),
        col("n_docs"), col("total"),
        lit(null).cast("long").as("n_seqs"), lit(null).cast("long").as("last_seq"))
    val keepers = delta.join(
      staged.filter(col("reason") === "keep").select("doc_id"),
      Seq("doc_id"), "left_semi")
    val cleaned = Dedup.substringDedupAgainstIndex(spark,
      keepers.select(col("doc_id"), col("text")), gramDir)
      .select(col("doc_id"), col("clean_text").as("text"))
    val encLens = Bpe.encodedLengthsFromIndex(spark, bpeDir, cleaned)
    val packs = Sampling.packSequencesOn(encLens, col("enc_len"), 512)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total"),
        count_distinct(col("bin")).as("n_seqs"), max(col("bin")).as("last_seq"))
      .select(lit("pack").as("stage"), col("shard").cast("string").as("key"),
        col("n_docs"), col("total"), col("n_seqs"), col("last_seq"))
    drops.unionByName(packs)
  }
}
