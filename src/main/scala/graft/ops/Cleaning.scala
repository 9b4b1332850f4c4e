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
    * Scale shape (round-9 fusion): the PER-ROW stage signals — quality
    * keep, both duplicate-n-gram fractions, and the dup-rank norm-hash
    * — come out of ONE pass over the corpus via [[TextOps]]' shared
    * column expressions (qualityKeepExpr / dupGramFrac — the same
    * primitives the standalone operators use, parity spec-pinned), so
    * the text is scanned, trimmed, tokenized and regexed once instead
    * of once per stage (the previous shape re-scanned the corpus per
    * verdict frame — read amplification a 100 TB crawl pays in full).
    * The only remaining corpus passes are the two genuine aggregates:
    * repetition's per-(doc, token) top-token count and contamination's
    * shingle explode (broadcast semi-join, [[Dedup.contamination]]).
    * The dup rank stays ONE window min over the norm-hash (shuffle on
    * the hash plus the narrow per-row verdict columns, no self-join,
    * never the text); the per-doc joins hash-partition on doc_id and
    * AQE coalesces the small sides; nothing here is all-pairs. */
  def corpusCleanQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val evalDocs = docs.filter(col("doc_id") < 50)
    val corpus = docs.filter(col("doc_id") >= 50)

    // one per-row pass: every map-side signal from a single tokenize
    val perRow = Tables.fanout(corpus)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        TextOps.qualityKeepExpr(col("text")).as("q_keep"),
        TextOps.dupGramFrac(TextOps.toks(col("text")), 2).as("dup_2gram_frac"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("norm_hash"))
      .withColumn("first_id", min(col("doc_id")).over(Window.partitionBy(col("norm_hash"))))
      .withColumn("is_dup", col("doc_id") =!= col("first_id"))
    // top-token concentration needs the per-(doc, token) aggregate —
    // the one repetition signal that is not per-row. No row for docs
    // with zero non-empty tokens → left join; r_keep stays null there
    // (the old left-joined repetitionScores frame had no row either)
    // and the verdict's coalesce defaults it to keep.
    val topTok = Tables.fanout(corpus)
      .select(col("doc_id"), explode(TextOps.toks(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_nonempty"))
      .select(col("doc_id"),
        (col("top_c").cast("double") / col("n_nonempty")).as("top_token_frac"))
    val contam = Dedup.contamination(corpus, evalDocs)
      .filter(col("contamination") >= 0.05)
      .select(col("doc_id"), lit(true).as("is_contam"))

    perRow
      .join(topTok, Seq("doc_id"), "left")
      .withColumn("r_keep", when(col("top_token_frac").isNotNull,
        (col("top_token_frac") < 0.2 && col("dup_2gram_frac") < 0.2).cast("long")))
      .join(contam, Seq("doc_id"), "left")
      .select(col("n_chars"),
        when(col("lang") =!= "en", lit("lang"))
          .when(col("q_keep") === 0L, lit("quality"))
          .when(coalesce(col("r_keep"), lit(1L)) === 0L, lit("repetition"))
          .when(col("is_dup"), lit("duplicate"))
          .when(coalesce(col("is_contam"), lit(false)), lit("contaminated"))
          .otherwise(lit("keep")).as("reason"))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
  }
}
