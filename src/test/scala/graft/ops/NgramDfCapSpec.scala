package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The ngram df-cap's two application forms must agree exactly:
  * the broadcast one-row `array_except` rebuild (small frequent sets)
  * and the left_anti-join fallback the size gate switches to when the
  * frequent set outgrows broadcast material (it is bounded only by
  * Σ shingle-instances / maxDf — linear in corpus size on
  * boilerplate-heavy corpora, and array_except pays O(|frequent|) per
  * row on top). Equality here plus the broadcast form's oracle
  * hash-match makes the fallback hash-green by transitivity.
  */
class NgramDfCapSpec extends SparkSuite {

  // 40 docs sharing a boilerplate prefix (every boilerplate shingle has
  // df = 40 > maxDf = 5 → frequent), each with unique filler, plus one
  // genuine near-dup pair sharing rare text — the result must be exactly
  // that pair under both cap forms.
  private def corpus: DataFrame = {
    import spark.implicits._
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val base = (1 to 40).map(i =>
      (i.toLong, s"$boiler unique$i alpha$i beta$i gamma$i delta$i"))
    val pair = Seq(
      (100L, "shared rare content block one two three four five six seven"),
      (101L, "shared rare content block one two three four five six seven eight"))
    (base ++ pair).toDF("doc_id", "text")
  }

  private def pairsSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e12))).toSet

  test("anti-join fallback ≡ broadcast df-cap on a boilerplate-heavy corpus") {
    val docs = corpus
    val bc = Dedup.ngramJaccardPairs(docs, maxDf = 5)
    val aj = Dedup.ngramJaccardPairs(docs, maxDf = 5, maxFrequentBroadcast = 0L)
    val bcSet = pairsSet(bc)
    assert(bcSet.nonEmpty, "spec needs a surviving near-dup pair")
    assert(bcSet.map(p => (p._1, p._2)) == Set((100L, 101L)),
      "boilerplate shingles must be df-capped out of the candidate set")
    assert(pairsSet(aj) == bcSet)
  }

  test("above the gate the plan anti-joins the frequent table, never collects it") {
    val aj = Dedup.ngramJaccardPairs(corpus, maxDf = 5, maxFrequentBroadcast = 0L)
    val plan = aj.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"),
      "expected a left_anti join against the frequent table in:\n" + plan.take(800))
    val bc = Dedup.ngramJaccardPairs(corpus, maxDf = 5)
    assert(!bc.queryExecution.optimizedPlan.toString.contains("LeftAnti"),
      "small frequent sets must keep the map-side array_except form")
    PipelineCaches.release(spark)
  }
}
