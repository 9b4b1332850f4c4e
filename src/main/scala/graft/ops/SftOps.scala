package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Post-pretraining data assembly: preference pairs (DPO/RLHF reward
  * data) and chat-transcript flattening (SFT pairs). Both are pure
  * one-shuffle-or-less column programs — the assembly steps between a
  * curated corpus and a fine-tuning run.
  */
object SftOps {

  /** Declared query q_pref_pairs: DPO-style preference-pair assembly —
    * bucket documents into candidate pairs (pair = doc_id div 2, the
    * deterministic stand-in for "two completions of one prompt") and
    * label the higher-quality member `chosen`, the other `rejected`,
    * with the quality margin. Quality = the stopword-ratio signal on
    * the declared 6-dp grid (the q_pmi rounded-cut convention);
    * score ties break chosen = larger doc_id, and incomplete pairs
    * (one member) are dropped.
    *
    * Scale shape: one narrow (pair_id, score) shuffle; the rank runs
    * inside 2-row partitions; the pivot to one row per pair is a
    * conditional aggregate on the same key — no join, no second
    * exchange. */
  def prefPairsQ(docs: DataFrame): DataFrame = {
    // the ONE quality-signal definition (TextOps.stopwordRatio)
    val ratio = TextOps.stopwordRatio(col("text"))
    val scored = graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), expr("doc_id div 2").as("pair_id"),
        round(ratio, 6).as("score"))
    val w = Window.partitionBy(col("pair_id"))
      .orderBy(col("score").desc, col("doc_id").desc)
    scored
      .withColumn("rn", row_number().over(w))
      .groupBy(col("pair_id"))
      .agg(count(lit(1)).as("np"),
        max(when(col("rn") === 1, col("doc_id"))).as("chosen_id"),
        max(when(col("rn") === 2, col("doc_id"))).as("rejected_id"),
        max(when(col("rn") === 1, col("score"))).as("chosen_score"),
        max(when(col("rn") === 2, col("score"))).as("rejected_score"))
      .filter(col("np") === 2)
      .select(col("pair_id"), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        round(col("chosen_score") - col("rejected_score"), 6).as("margin"))
  }

  private val TurnSchema = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Declared query q_chat_turns: chat-transcript flattening — the SFT
    * step that turns serialized conversations into (prompt, response)
    * training pairs. The fixture corpus is plain text, so the query
    * first SERIALIZES a deterministic transcript per document
    * (alternating user/assistant turns of 8 tokens — the redactQ
    * synthesis precedent), then runs the operator under test: parse
    * the JSON transcript (`from_json` with a typed turn schema),
    * explode the turns, and pair user turn 2i with assistant turn
    * 2i+1. The oracle derives the same pairs from the token stream
    * directly — gating that the engine's serialize→parse→flatten path
    * is lossless.
    *
    * Scale shape: pure per-row JSON/array expressions + one Generate —
    * embarrassingly parallel, no shuffle, no UDF. */
  def chatTurnsQ(docs: DataFrame): DataFrame = {
    val toksA = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val nTurns = ceil(size(col("__toks")).cast("double") / 8.0).cast("int")
    val turns = when(size(col("__toks")) > 0,
      transform(sequence(lit(0), nTurns - 1), i => struct(
        when(i % 2 === 0, lit("user")).otherwise(lit("assistant")).as("role"),
        concat_ws(" ", slice(col("__toks"), i * 8 + 1, lit(8))).as("content"))))
      .otherwise(lit(null).cast(TurnSchema))
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), toksA.as("__toks"))
      .withColumn("transcript", to_json(turns)).drop("__toks")
      // the operator under test: typed parse of the serialized chat
      .withColumn("turns", from_json(col("transcript"), TurnSchema))
      .filter(col("turns").isNotNull && size(col("turns")) >= 2)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), (size(col("turns")) / 2).cast("int") - 1,
          lit(1)), i => struct(
            col("turns")(i * 2)("content").as("prompt"),
            col("turns")(i * 2 + 1)("content").as("response")))))
      .filter(col("col.response").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("pair_idx"),
        col("col.prompt").as("prompt"), col("col.response").as("response"),
        size(split(col("col.prompt"), " ")).cast("long").as("n_prompt_tok"),
        size(split(col("col.response"), " ")).cast("long").as("n_response_tok"))
  }
}
