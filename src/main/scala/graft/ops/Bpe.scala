package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units") — the vocabulary-
  * induction step of a training-data pipeline, run as pure DataFrame
  * ops. The classic formulation: collapse the corpus to WORD TYPES with
  * counts, segment each word into characters, then repeatedly (1) count
  * adjacent symbol pairs weighted by word count, (2) take the most
  * frequent pair (ties: count desc, then pair lexicographically), and
  * (3) merge that pair greedily left-to-right in every word.
  *
  * Scale shape: the corpus collapses to the vocab-bounded word-count
  * table in ONE token shuffle (the same budget every TextOps aggregate
  * pays), and each training round is one pair-count partial+final
  * aggregate over that table plus a ONE-ROW argmax collect — the merge
  * application is a map-side array fold (no shuffle, no growth). k
  * rounds = k vocab-bounded aggregates; corpus size only enters through
  * the initial word count. The learned rule list is metadata (k rows)
  * by construction — collecting each round's winner to the driver is
  * the same metadata-collect discipline as the histogram-select
  * percentile locator.
  *
  * Determinism: pair counts are integer sums; the argmax tie-break is
  * total (count desc, sym_a asc, sym_b asc — codepoint order on both
  * engines); greedy application is the unique leftmost non-overlapping
  * matching, realized here as a replace-last fold (provably equal to
  * the lookahead scan for a single rule). The whole train replays
  * bit-identically in any engine — the DuckDB oracle re-runs it via
  * per-round recursive CTEs.
  */
object Bpe {

  /** Corpus → (word, n) vocab table: the one corpus-scale shuffle. */
  def wordCounts(docs: DataFrame): DataFrame =
    graft.sources.Tables.fanout(docs)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Character segmentation of a word — explicit positional substrings
    * (NOT an empty-pattern split, whose semantics differ per engine). */
  private[ops] def charSymbols(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Segmentation under a rule list via the NATIVE [[graft.functions.
    * BpeSegment]] expression — value-parity with the composed
    * charSymbols + applyMerge fold stack (BpeSegmentProps, and pinned
    * end-to-end against the fold spelling in BpeSpec). The fold stack's
    * codegen grows with the rule count, so each training round re-paid
    * a strictly larger Janino compile; the native form is one
    * constant-size static call for any k. */
  private def segmented(wordCol: String, rules: Seq[(String, String)]): Column = {
    val b64 = graft.functions.BpeSegment.encodeRules(rules)
    expr(s"${graft.functions.BpeSegment.FnName}($wordCol, '$b64')")
  }

  /** Greedy left-to-right application of ONE merge rule (a, b) → a+b as
    * a replace-last fold: walk the symbols, and when the accumulator's
    * last element is `a` and the current symbol is `b`, replace that
    * last element with the merged token; else append. `try_element_at`
    * keeps the empty-accumulator probe null-safe under ANSI. */
  private[ops] def applyMerge(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `k` merges over the word-count table; returns the rules in
    * learned order as (round, sym_a, sym_b, n_pair). */
  def trainMerges(words: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    require(k > 0, s"k must be positive, got $k")
    val cached = PipelineCaches.track(words)
    graft.functions.BpeSegment.register(words.sparkSession)
    val rules = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to k) {
      // segmentation after the rules learned so far: one native
      // constant-size expression over the cached vocab table — no
      // shuffle, re-derived lazily each round
      val sym = segmented("word", rules.toList.map(t => (t._2, t._3)))
      val winner = cached
        .select(col("n"), sym.as("sym"))
        .select(col("n"),
          slice(col("sym"), lit(1), size(col("sym")) - 1).as("sa"),
          slice(col("sym"), lit(2), size(col("sym")) - 1).as("sb"))
        .select(col("n"), explode(arrays_zip(col("sa"), col("sb"))).as("p"))
        .groupBy(col("p.sa").as("sym_a"), col("p.sb").as("sym_b"))
        .agg(sum(col("n")).as("n_pair"))
        .orderBy(col("n_pair").desc, col("sym_a").asc, col("sym_b").asc)
        .limit(1)
        .collect()
      require(winner.nonEmpty,
        s"BPE round $r: no adjacent pairs left (corpus degenerate below k=$k)")
      val w = winner.head
      rules += ((r, w.getString(0), w.getString(1), w.getLong(2)))
    }
    rules.toList
  }

  /** Declared query q_bpe_merges: the first 6 merge rules learned from
    * the documents corpus, as a literal k-row frame. */
  def bpeMergesQ(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 6): DataFrame = {
    val words = wordCounts(graft.sources.Tables.documents(spark, dir))
    val rules = trainMerges(words, k)
    PipelineCaches.release(spark)
    import spark.implicits._
    rules.toDF("round", "sym_a", "sym_b", "n_pair")
      .select(col("round").cast("long").as("round"),
        col("sym_a"), col("sym_b"), col("n_pair"))
  }

  /** Declared query q_bpe_encode — the APPLY side of the tokenizer:
    * every vocab word segmented under the k learned merges, with its
    * corpus count and symbol count. This is the production encode path
    * (a document tokenizes by looking its words up here, or by running
    * the same walk inline): train once, then ONE map-side pass — the
    * rule list rides a single native [[graft.functions.BpeSegment]]
    * call, no shuffle beyond the vocab build, corpus size only in the
    * word counts. */
  def bpeEncodeQ(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 6): DataFrame = {
    val words = wordCounts(graft.sources.Tables.documents(spark, dir))
    val rules = trainMerges(words, k)
    // do NOT release here: trainMerges tracked the word-count table and
    // the returned frame reads it again at execution — releasing early
    // recomputes the corpus tokenize+shuffle (the caller releases, the
    // packSequencesOn lifetime contract)
    graft.functions.BpeSegment.register(spark)
    val sym = segmented("word", rules.toList.map(t => (t._2, t._3)))
    words.select(col("word"), col("n"),
      size(sym).cast("long").as("n_sym"),
      concat_ws(" ", sym).as("bpe"))
  }

  /** Declared query q_tokenize_pack — the END-TO-END export path a
    * pretraining pipeline actually runs: train the tokenizer (k merge
    * rounds), ENCODE the corpus under it, and pack the encoded token
    * stream into fixed 512-token training sequences in the
    * deterministic shard order. Composition surface: the encoded
    * per-doc length comes from joining each doc's words to the
    * vocab-bounded segmentation table (broadcast — the vocab is the
    * model, never corpus-sized), and the packing is
    * [[Sampling.packSequencesOn]] over that length — the identical
    * slice-parallel prefix sums q_pack gates, just on post-BPE
    * lengths. Per-shard summary (docs, encoded tokens, sequences,
    * last sequence id) — every bin assignment participates in the
    * hash through the distinct-bin count. */
  def tokenizePackQ(spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 6, tokenBudget: Int = 512): DataFrame =
    tokenizePack(graft.sources.Tables.documents(spark, dir), k, tokenBudget)

  /** Per-doc encoded length of `docs` under merges trained on
    * `trainDocs` — the train/apply split the composed pipeline needs
    * (tokenizer induced on the raw corpus, applied to the cleaned
    * survivors). `docs`' tokens must be a subset of the training
    * vocabulary (true whenever `docs` derives from `trainDocs` by
    * filtering/excision); a doc with no encodable tokens emits no row.
    * Output: (doc_id, enc_len). */
  def encodedLengths(trainDocs: DataFrame, docs: DataFrame,
      k: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    val words = wordCounts(trainDocs)
    val rules = trainMerges(words, k)
    graft.functions.BpeSegment.register(spark)
    val sym = segmented("word", rules.toList.map(t => (t._2, t._3)))
    val enc = words.select(col("word"), size(sym).cast("long").as("n_sym"))
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(enc), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sym")).as("enc_len"))
  }

  /** Declared query q_tokenizer_fertility — the tokenizer-EVAL readout
    * every vocab decision is judged by (fertility = encoded tokens per
    * word; compression = chars per encoded token), broken out per
    * source so a mixing decision can see which slices the tokenizer
    * serves poorly. The model is the q_bpe_encode tokenizer (k merges
    * over the full corpus); stats fold in ONE per-source aggregate
    * over the word stream joined to the vocab-bounded broadcast encode
    * table — the corpus is scanned once for training (wordCounts) and
    * once for the stats, nothing all-pairs. Ratios are single
    * divisions of exact BIGINT sums, rounded 6 dp — deterministic in
    * both engines. */
  def tokenizerFertilityQ(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = 6): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val words = wordCounts(docs)
    val rules = trainMerges(words, k)
    graft.functions.BpeSegment.register(spark)
    val sym = segmented("word", rules.toList.map(t => (t._2, t._3)))
    val enc = words.select(col("word"), size(sym).cast("long").as("n_sym"))
    graft.sources.Tables.fanout(docs)
      .select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(enc), Seq("word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_tokens"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("source"), col("n_words"), col("n_tokens"), col("n_chars"),
        round(col("n_tokens").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"),
        round(col("n_chars").cast("double") /
          col("n_tokens").cast("double"), 6).as("chars_per_token"))
  }

  /** Persist the frozen-tokenizer artifact: the (word → n_sym) encode
    * table under merges trained on `trainDocs`. This is what makes a
    * production delta batch's encode cost independent of the training
    * corpus — induction (one corpus shuffle + k vocab-bounded rounds)
    * happens once at write time; every later batch broadcasts the
    * vocab-bounded table ([[encodedLengthsFromIndex]]) and never
    * touches the training text again. Same OOV convention as
    * [[encodedLengths]]: a word absent from the training vocabulary
    * contributes nothing (the declared engine-side stand-in for
    * byte-fallback). */
  def writeEncoder(trainDocs: DataFrame, dir: String, k: Int = 6): Unit = {
    val spark = trainDocs.sparkSession
    val words = wordCounts(trainDocs)
    val rules = trainMerges(words, k)
    graft.functions.BpeSegment.register(spark)
    val sym = segmented("word", rules.toList.map(t => (t._2, t._3)))
    words.select(col("word"), size(sym).cast("long").as("n_sym"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/enc")
  }

  /** Per-doc encoded length of `docs` under the persisted encoder —
    * the steady-state read: one broadcast of the vocab-bounded table,
    * no training-corpus access. */
  def encodedLengthsFromIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, docs: DataFrame): DataFrame = {
    val enc = spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("word",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_sym",
        org.apache.spark.sql.types.LongType))))
      .parquet(s"$dir/enc")
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(enc), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sym")).as("enc_len"))
  }

  /** [[tokenizePackQ]] over an arbitrary documents frame (the
    * ScaleSmoke amplification entry point). */
  def tokenizePack(docs: DataFrame, k: Int = 6,
      tokenBudget: Int = 512): DataFrame = {
    val spark = docs.sparkSession
    val words = wordCounts(docs)
    val rules = trainMerges(words, k)
    // no release here — enc re-reads the tracked word-count table at
    // execution (see bpeEncodeQ); the caller releases
    graft.functions.BpeSegment.register(spark)
    val sym = segmented("word", rules.toList.map(t => (t._2, t._3)))
    val enc = words.select(col("word"), size(sym).cast("long").as("n_sym"))
    val encLens = graft.sources.Tables.fanout(docs)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(enc), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sym")).as("enc_len"))
    Sampling.packSequencesOn(encLens, col("enc_len"), tokenBudget)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_enc_tokens"),
        count_distinct(col("bin")).as("n_seqs"),
        max(col("bin")).as("last_seq"))
  }
}
