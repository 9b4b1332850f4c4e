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
    * Scale shape: the stage verdicts are four frames joined on doc_id —
    * quality and repetition are per-row / per-doc aggregates from
    * [[TextOps]], the dup rank is ONE window min over the norm-hash
    * (shuffle on the hash, no self-join), contamination is the
    * broadcast semi-join of [[Dedup.contamination]]. The joins all
    * hash-partition on doc_id, AQE coalesces the small sides; nothing
    * here is all-pairs and no stage shuffles document text except the
    * norm-hash grouping's 32-hex digests. */
  def corpusCleanQ(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val evalDocs = docs.filter(col("doc_id") < 50)
    val corpus = docs.filter(col("doc_id") >= 50)

    val quality = TextOps.qualityScores(corpus)
      .select(col("doc_id"), col("keep").as("q_keep"))
    // no row for docs with zero non-empty tokens → left join + default
    // keep (such docs already failed the quality stage's n_tokens >= 10)
    val rep = TextOps.repetitionScores(corpus)
      .select(col("doc_id"), col("keep").as("r_keep"))
    val dupRank = corpus
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("norm_hash"))
      .withColumn("first_id", min(col("doc_id")).over(Window.partitionBy(col("norm_hash"))))
      .select(col("doc_id"), (col("doc_id") =!= col("first_id")).as("is_dup"))
    val contam = Dedup.contamination(corpus, evalDocs)
      .filter(col("contamination") >= 0.05)
      .select(col("doc_id"), lit(true).as("is_contam"))

    corpus
      .select(col("doc_id"), col("lang"), length(col("text")).cast("long").as("n_chars"))
      .join(quality, Seq("doc_id"))
      .join(rep, Seq("doc_id"), "left")
      .join(dupRank, Seq("doc_id"))
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
