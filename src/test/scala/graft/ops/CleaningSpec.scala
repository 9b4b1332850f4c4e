package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The composed cleaning pipeline: the report must PARTITION the corpus
  * (every doc counted exactly once, under its first failing stage) and
  * agree with the underlying declared operators it composes. */
class CleaningSpec extends SparkSuite {

  test("reasons partition the corpus and stage counts agree with the operators") {
    val out = Cleaning.corpusCleanQ(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") >= 50)

    val reasons = out.select("reason").collect().map(_.getString(0)).toSet
    assert(reasons.subsetOf(
      Set("lang", "quality", "repetition", "duplicate", "contaminated", "keep")),
      reasons.toString)
    assert(out.agg(sum("n_docs")).head.getLong(0) == corpus.count(),
      "report does not partition the corpus")

    // first-stage counts agree with the operator computed directly
    val byReason = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nonEn = corpus.filter(col("lang") =!= "en").count()
    assert(byReason.getOrElse("lang", 0L) == nonEn)
    // quality rejections = en docs failing the quality keep flag
    val qFail = TextOps.qualityScores(corpus.filter(col("lang") === "en"))
      .filter(col("keep") === 0L).count()
    assert(byReason.getOrElse("quality", 0L) == qFail)
    out.unpersist()
  }

  test("shared per-row expressions match the standalone operator frames") {
    // the round-9 fusion computes the stage verdicts from
    // qualityKeepExpr / dupGramFrac in ONE pass — pin that they equal
    // the frames qualityScores / repetitionScores produce, doc by doc
    val docs = graft.sources.Tables.documents(spark, sf)
    val viaExpr = docs.select(col("doc_id"),
      TextOps.qualityKeepExpr(col("text")).as("k2"),
      TextOps.dupGramFrac(TextOps.toks(col("text")), 2).as("d2"),
      TextOps.dupGramFrac(TextOps.toks(col("text")), 3).as("d3"))
    val q = TextOps.qualityScores(docs).select(col("doc_id"), col("keep"))
    val r = TextOps.repetitionScores(docs)
      .select(col("doc_id"), col("dup_2gram_frac"), col("dup_3gram_frac"))
    val bad = viaExpr.join(q, "doc_id").join(r, "doc_id")
      .filter(col("k2") =!= col("keep") ||
        col("d2") =!= col("dup_2gram_frac") || col("d3") =!= col("dup_3gram_frac"))
      .count()
    assert(bad == 0, s"$bad docs diverge between expr and frame forms")
  }

  test("char totals are consistent with the per-reason doc sets") {
    val out = Cleaning.corpusCleanQ(spark, sf)
    val total = out.agg(sum("total_chars")).head.getLong(0)
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") >= 50)
      .agg(sum(length(col("text")))).head.getLong(0)
    assert(total == expected)
  }
}
