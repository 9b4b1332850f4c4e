package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval and data-selection scoring over the document corpus:
  * BM25 term scoring (the retrieval-quality readout next to
  * [[TextOps.tfidfQ]]'s tf-idf) and DSIR-style hashed-token importance
  * weights (domain-targeted data selection — score every candidate
  * document by how much more likely its token stream is under a target
  * distribution than under the corpus's own).
  *
  * Both share the scale posture of the rest of the text surface: token
  * streams are exploded and aggregated, never collected; every
  * model-side table (term idf, bucket log-ratios, corpus scalars) is
  * BOUNDED (|terms|, nBuckets, or 1 row) and broadcasts; the only
  * corpus-sized shuffles are keyed per-doc aggregates.
  */
object Scoring {

  private def toks(docs: DataFrame): Column =
    split(lower(trim(col("text"))), "\\s+")

  private def tokensOf(docs: DataFrame): DataFrame =
    graft.sources.Tables.fanout(docs)
      .select(col("doc_id"), explode(toks(docs)).as("token"))
      .filter(col("token") =!= "")

  /** BM25 over a fixed query term set (k1 = 1.2, b = 0.75). One
    * corpus-sized pass builds per-doc lengths; the query-term pass is
    * filtered BEFORE its aggregate, so tf rows are bounded by
    * docs × |terms|. The idf table (|terms| rows) and the (N, avgdl)
    * scalar broadcast; the tf ⋈ doclen join is the one doc-keyed
    * shuffle. Docs matching no query term score no row (standard
    * retrieval semantics — mirrored by the oracle's inner joins). */
  def bm25Q(docs: DataFrame,
            terms: Seq[String] = Seq("data", "query", "engine", "fast"),
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ONE corpus token pass: a pivot-style per-doc aggregate carries the
    // document length AND one tf lane per query term (|terms| is small
    // and fixed — the wide agg is |terms|+1 counters per doc). df per
    // term then folds out of the SAME doc-cardinality frame (df(t) =
    // #docs with tf_t > 0) in the one-row stats aggregate, so nothing
    // re-explodes and no join is keyed on doc_id — everything after the
    // per-doc aggregate is map-side against a broadcast scalar row.
    val perDoc = tokensOf(docs)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        terms.map(t =>
          count(when(col("token") === t, 1)).as(s"tf_$t")): _*)
    val statAggs = Seq(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")) ++
      terms.map(t => count(when(col(s"tf_$t") > 0, 1)).as(s"df_$t"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t")
      when(tf > 0,
        log((col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5) + 1.0) *
          tf * (k1 + 1) /
          (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        terms.map(t => (col(s"tf_$t") > 0).cast("long"))
          .reduce(_ + _).as("n_terms_matched"),
        round(terms.map(termScore).reduce(_ + _), 6).as("bm25"))
      .filter(col("n_terms_matched") > 0)
  }

  /** DSIR-style importance weights: hash every token into one of
    * `nBuckets` buckets (the 60-bit md5 prefix the dedup lanes use, so
    * the oracle spells the identical hash), estimate the target and
    * raw (candidate) unigram distributions over buckets with add-one
    * smoothing, and score each candidate doc by its mean bucket
    * log-likelihood ratio ln(p_target/p_raw). High scores = documents
    * that look like the target domain — the data-selection signal for
    * assembling a domain-weighted training mix.
    *
    * The bucket-count pass reduces the corpus token stream to
    * ≤ nBuckets rows (map-side partials do almost all the work); the
    * totals fold those ≤ nBuckets rows once more. The scoring pass
    * re-explodes tokens and hash-joins the broadcast λ table on
    * bucket — recomputing tokens is deliberate: at 100 TB nobody
    * caches a corpus token stream, and the second pass is exactly as
    * parallel as the first. */
  def dsirQ(spark: SparkSession, docs: DataFrame,
            targetPred: Column = col("lang") === "en" &&
              col("source").isin("src1", "src2", "src3"),
            nBuckets: Int = 256): DataFrame = {
    graft.functions.Md5Bits.register(spark)
    def bucket(c: Column): Column =
      pmod(call_function(graft.functions.Md5Bits.FnName, c, lit(0), lit(15)),
        lit(nBuckets.toLong))
    // the flag rides the explode — joining it back post-explode would be
    // a second corpus-sized shuffle for one boolean
    val tokens = graft.sources.Tables.fanout(docs.withColumn("is_target", targetPred))
      .select(col("doc_id"), col("is_target"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .select(col("doc_id"), col("is_target"), bucket(col("token")).as("bkt"))
    val counts = tokens.groupBy(col("bkt")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t_cnt"),
      sum(when(!col("is_target"), 1L).otherwise(0L)).as("r_cnt"))
    val totals = counts.agg(sum(col("t_cnt")).as("t_tot"), sum(col("r_cnt")).as("r_tot"))
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("bkt"),
        (log((col("t_cnt") + 1.0) / (col("t_tot") + nBuckets)) -
          log((col("r_cnt") + 1.0) / (col("r_tot") + nBuckets))).as("lam"))
    tokens.filter(!col("is_target"))
      .join(broadcast(lam), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(avg(col("lam")), 6).as("dsir_weight"))
  }
}
