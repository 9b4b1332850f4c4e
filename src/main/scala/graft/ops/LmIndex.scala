package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The THIRTEENTH persisted index: the bigram-LM sufficient statistics
  * behind [[Scoring.ngramLmQ]], kept incrementally.
  *
  * The CCNet-style perplexity filter retrains as target-language text
  * accumulates; the model is ONE grouping-sets aggregate whose every
  * row is an additive count — (gid=0: bigram C(a,b); gid=1: unigram
  * C(a), with vocabulary size V = the distinct-ra count of that
  * level). So the index is pure ReportIndex discipline: per-batch
  * partial files (any DOC-COMPLETE batch — pairs are within-document,
  * so arbitrary document slices fold exactly), reader re-aggregates,
  * [[DirSwap]] compaction to one file per hash bucket. Scoring reads
  * the folded model and runs the shared [[Scoring.lmScore]] pass —
  * corpus-sized work happens once per batch at append time, a model
  * refresh never re-touches raw training text. */
object LmIndex {

  private val CountsSchema = StructType(Seq(
    StructField("gid", IntegerType), StructField("ra", StringType),
    StructField("rb", StringType), StructField("n", LongType),
    StructField("bkt", IntegerType)))


  // 16, not the ReportIndex 64: the model READ is always full-table
  // (scoring needs the whole model), so buckets only buy compaction
  // parallelism — and the per-dir listing/footer floor on the read
  // (~3 ms/dir × files) is the measured fixture cost. A 100 TB corpus
  // vocabulary is ~1e8 rows ≈ 2 GB of counts — 16 buckets keeps every
  // bucket comfortably task-sized.
  private val HashBuckets = 16

  private def partials(docs: DataFrame, trainLang: String): DataFrame =
    Scoring.lmTrainCounts(docs, trainLang)
      .withColumn("gid", col("gid").cast("int"))
      .withColumn("bkt", pmod(abs(hash(col("ra"))), lit(HashBuckets)).cast("int"))
      .select(col("gid"), col("ra"), col("rb"), col("n"), col("bkt"))

  def writeLmIndex(docs: DataFrame, dir: String,
      trainLang: String = "en"): Unit = {
    // static-overwrite wipes the whole counts dir — any leftover
    // forget ledger (which lives inside it) dies with it, so a
    // from-scratch build cannot inherit stale corrections (r13 class);
    // the generation reset drops stale committed compaction gens too
    DirSwap.reset(docs.sparkSession, s"$dir/counts")
    partials(docs, trainLang)
      .repartition(col("bkt"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static").partitionBy("bkt").parquet(s"$dir/counts")
  }

  /** Right-to-be-forgotten on an ADDITIVE-count index via the shared
    * [[ForgetLedger]] (one in-dir append: registry rows for
    * idempotence + the victims' own count contribution, which
    * [[modelFromIndex]]'s fold nets out). Callers pass the victim
    * DOCUMENTS (a delete request holds the content until erasure);
    * ids already forgotten are dropped first, so re-requests cannot
    * double-subtract, and victims that contributed nothing (wrong
    * language, empty text) just register. Contract: victims must be
    * docs previously ingested into THIS index with the same text — a
    * count store cannot recover per-doc contributions by itself
    * (unlike the TextIndex dl, which rides on posting rows). Physical
    * erasure of the netted counts rides [[compactLmIndex]]'s one
    * swap. */
  def forgetFromLmIndex(spark: SparkSession, dir: String,
      victimDocs: DataFrame, trainLang: String = "en"): Unit = {
    val counts = DirSwap.resolve(spark, s"$dir/counts")
    val fresh = ForgetLedger.fresh(spark, counts,
      victimDocs.select("doc_id")).cache()
    val freshDocs = victimDocs
      .withColumn("doc_id", col("doc_id").cast("long"))
      .join(broadcast(fresh), Seq("doc_id"), "left_semi")
    ForgetLedger.commit(counts, fresh, partials(freshDocs, trainLang))
    fresh.unpersist()
    ()
  }

  /** The folded (gid, ra, rb, bkt) → n table: base partials minus the
    * forget ledger's contributions, zero-count rows dropped (a token
    * alive only in forgotten docs must leave the vocabulary, or V
    * would overcount). Steady state (no ledger) adds no job. */
  private def foldCounts(spark: SparkSession, dir: String): DataFrame = {
    val counts = DirSwap.resolve(spark, s"$dir/counts")
    val base = spark.read.schema(CountsSchema).parquet(counts)
    val all = ForgetLedger.contributions(spark, counts, CountsSchema)
      .fold(base)(c => base.unionByName(
        c.withColumn("n", -col("n"))
          .select(CountsSchema.fieldNames.toSeq.map(col): _*)))
    all.groupBy(col("gid"), col("ra"), col("rb"), col("bkt"))
      .agg(sum(col("n")).as("n"))
      .filter(col("n") > 0)
      .select(col("gid"), col("ra"), col("rb"), col("n"), col("bkt"))
  }

  /** Fold newly ingested documents in — additive partial-file appends
    * (doc-complete batches; the reader re-aggregates). */
  def appendToLmIndex(newDocs: DataFrame, dir: String,
      trainLang: String = "en"): Unit =
    partials(newDocs, trainLang)
      .repartition(col("bkt"))
      .write.mode("append").partitionBy("bkt")
      .parquet(DirSwap.resolve(newDocs.sparkSession, s"$dir/counts"))

  /** Collapse per-batch partials to one file per bucket ([[DirSwap]]);
    * when a forget ledger exists this is also the PURGE — the rewrite
    * bakes the negative corrections in (zero-count grams physically
    * gone), and because the ledger lives INSIDE the counts dir, the
    * same swap retires it: one commit, so a crashed compaction retried
    * from the top converges without ever double-applying a
    * correction. */
  def compactLmIndex(spark: SparkSession, dir: String): Unit =
    DirSwap(spark, s"$dir/counts") { out =>
      foldCounts(spark, dir)
        .repartition(col("bkt"))
        .write.partitionBy("bkt").parquet(out)
    }

  /** The folded model (partials summed, forget corrections netted). */
  def modelFromIndex(spark: SparkSession, dir: String): DataFrame =
    foldCounts(spark, dir)
      .groupBy(col("gid"), col("ra"), col("rb"))
      .agg(sum(col("n")).as("n"))

  /** Perplexity-score a document frame under the index's model — the
    * steady-state read. */
  def scoreFromIndex(spark: SparkSession, dir: String, docs: DataFrame,
      alpha: Double = 0.1): DataFrame = {
    val model = PipelineCaches.track(modelFromIndex(spark, dir))
    val uni = model.filter(col("gid") === 1)
      .select(col("ra").as("u_tok"), col("n").as("n_u"))
    val bi = model.filter(col("gid") === 0 && col("rb").isNotNull)
      .select(col("ra").as("bi_a"), col("rb").as("bi_b"), col("n").as("n_ab"))
    val vsz = model.filter(col("gid") === 1).agg(count(lit(1)).as("v"))
    Scoring.lmScore(docs, uni, bi, vsz, alpha)
  }

  /** Declared query q_ngram_lm_incr: the en train slice indexed in two
    * doc-complete batches (doc_id % 20 split), every document scored
    * under the FOLDED model — which must equal the batch
    * [[Scoring.ngramLmQ]] over the same corpus (count additivity; the
    * shared oracle text is the law). */
  def ngramLmIncrQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val idxDir = BuildOnce.tempDirFor("graft_lm_idx", dir)
    BuildOnce(spark, idxDir, Seq(dir)) {
      writeLmIndex(docs.filter(col("doc_id") % 20 =!= 0), idxDir)
      appendToLmIndex(docs.filter(col("doc_id") % 20 === 0), idxDir)
    }
    scoreFromIndex(spark, idxDir, docs)
  }

  /** Kneser-Ney scoring from the SAME index (q_kneser_ney_incr): every
    * KN statistic — c(v), the follower/predecessor type counts, the
    * bigram-type total — derives from the folded bigram table, so one
    * persisted count store serves BOTH smoothing laws; switching the
    * production filter from add-α to KN is a reader change, no
    * re-ingestion. Must equal the batch [[Scoring.kneserNeyQ]] over
    * the same corpus (count additivity over doc-complete batches —
    * the shared oracle text is the law). */
  def kneserNeyFromIndex(spark: SparkSession, dir: String,
      docs: DataFrame, discount: Double = 0.75): DataFrame = {
    val model = PipelineCaches.track(modelFromIndex(spark, dir))
    val uni = model.filter(col("gid") === 1)
      .select(col("ra").as("u_tok"), col("n").as("n_u"))
    val bi = model.filter(col("gid") === 0 && col("rb").isNotNull)
      .select(col("ra").as("bi_a"), col("rb").as("bi_b"), col("n").as("n_ab"))
    Scoring.kneserNeyScore(docs, uni, bi, discount)
  }

  /** Declared query q_kneser_ney_incr: the q_ngram_lm_incr build (same
    * memoized artifact — BuildOnce shares it), read under the KN law. */
  def kneserNeyIncrQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val idxDir = BuildOnce.tempDirFor("graft_lm_idx", dir)
    BuildOnce(spark, idxDir, Seq(dir)) {
      writeLmIndex(docs.filter(col("doc_id") % 20 =!= 0), idxDir)
      appendToLmIndex(docs.filter(col("doc_id") % 20 === 0), idxDir)
    }
    kneserNeyFromIndex(spark, idxDir, docs)
  }

  /** Declared query q_lm_forget: the forget path on an ADDITIVE-count
    * index — the q_ngram_lm_incr build in its OWN dir (forgetting
    * mutates state), every doc_id ≡ 0 (mod 17) forgotten via the
    * negative-count ledger, SURVIVORS scored under the netted model —
    * which must equal the batch [[Scoring.ngramLmQ]] over the
    * surviving corpus alone (victims leave the training counts AND
    * the vocabulary). */
  def lmForgetQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val idxDir = BuildOnce.tempDirFor("graft_lm_idx_forget", dir)
    BuildOnce(spark, idxDir, Seq(dir)) {
      writeLmIndex(docs.filter(col("doc_id") % 20 =!= 0), idxDir)
      appendToLmIndex(docs.filter(col("doc_id") % 20 === 0), idxDir)
      forgetFromLmIndex(spark, idxDir, docs.filter(col("doc_id") % 17 === 0))
    }
    scoreFromIndex(spark, idxDir, docs.filter(col("doc_id") % 17 =!= 0))
  }

  /** Jensen–Shannon drift of an incoming shard against the PERSISTED
    * corpus distribution (q_drift_incr) — crawl-over-crawl monitoring
    * without re-scanning the base corpus: the index's folded unigram
    * counts (gid = 1 — the (a)-level rows of the grouping-sets train)
    * ARE the baseline distribution P, so the only corpus-sized work is
    * counting the delta shard's own tokens Q. Third reader law on the
    * ONE count store (add-α scoring, Kneser-Ney, now drift) — adding a
    * monitoring readout is a reader change, no re-ingestion.
    *
    * Same JS as [[TextOps.sourceDriftQ]] but with ONE pair the
    * full-outer token join is the natural shape (vocab-bounded,
    * token-keyed): Σ m·ln m, Σ p·ln p, Σ q·ln q in one aggregate,
    * totals as ONE-row broadcast scalars. Output one row:
    * JS(P_index, Q_shard) in nats and bits, with the type/token counts
    * for the audit columns. */
  def driftIncrQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.documents(spark, dir)
    val idxDir = BuildOnce.tempDirFor("graft_lm_idx", dir)
    BuildOnce(spark, idxDir, Seq(dir)) {
      writeLmIndex(docs.filter(col("doc_id") % 20 =!= 0), idxDir)
      appendToLmIndex(docs.filter(col("doc_id") % 20 === 0), idxDir)
    }
    driftFromIndex(spark, idxDir, docs.filter(col("doc_id") % 20 === 0))
  }

  /** The drift READER — JS of `delta`'s unigram distribution against
    * the index's folded one (shared by [[driftIncrQ]] and the
    * ingestion-loop parity drill: drift over an appended/forgotten
    * index must equal drift over a survivor rebuild). */
  def driftFromIndex(spark: SparkSession, dir: String,
      delta: DataFrame): DataFrame = {
    val p = PipelineCaches.track(modelFromIndex(spark, dir)
      .filter(col("gid") === 1)
      .select(col("ra").as("token"), col("n").as("np")))
    val q = PipelineCaches.track(
      Scoring.lmTrainCounts(delta, "en")
        .filter(col("gid") === 1)
        .select(col("ra").as("token"), col("n").as("nq")))
    val totP = p.agg(sum(col("np")).as("n_base"),
      count(lit(1)).as("n_base_types"))
    val totQ = q.agg(sum(col("nq")).as("n_delta"),
      count(lit(1)).as("n_delta_types"))
    val joined = p.join(q, Seq("token"), "full_outer")
      .crossJoin(broadcast(totP)).crossJoin(broadcast(totQ))
    val pp = coalesce(col("np"), lit(0L)).cast("double") /
      col("n_base").cast("double")
    val pq = coalesce(col("nq"), lit(0L)).cast("double") /
      col("n_delta").cast("double")
    val m = (pp + pq) / 2
    val agg = joined.agg(
      max(col("n_base")).as("n_base"), max(col("n_delta")).as("n_delta"),
      max(col("n_base_types")).as("n_base_types"),
      max(col("n_delta_types")).as("n_delta_types"),
      sum(when(col("np").isNotNull && col("nq").isNotNull, lit(1L))
        .otherwise(lit(0L))).as("n_common_types"),
      sum(m * log(m)).as("mlnm"),
      sum(when(col("np").isNotNull, pp * log(pp)).otherwise(lit(0.0))).as("plnp"),
      sum(when(col("nq").isNotNull, pq * log(pq)).otherwise(lit(0.0))).as("qlnq"))
    val js = -col("mlnm") + (col("plnp") + col("qlnq")) / 2
    agg.select(col("n_base"), col("n_delta"), col("n_base_types"),
      col("n_delta_types"), col("n_common_types"),
      round(js, 6).as("js_nats"),
      round(js / math.log(2.0), 6).as("js_bits"))
  }
}
