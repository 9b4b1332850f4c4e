package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The near-dup verify stage must produce IDENTICAL results whether the
  * per-doc hashed-set dictionary is broadcast (the default, while it
  * fits the broadcast budget) or sort-merge-joined on doc id (the
  * 100 TB path, where it cannot). Result equality here plus the
  * broadcast mode's oracle hash-match makes the bucketed mode
  * hash-green by transitivity.
  */
class DedupVerifyModeSpec extends SparkSuite {

  private def docsDf = spark.read.parquet(s"$sf/documents.parquet")

  // jaccard rounded to 1e-12: both modes compute the same expression on
  // the same operands, but Set equality on raw doubles would also pass —
  // the rounding just keeps the comparison honest about intent.
  private def pairsSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e12))).toSet

  test("minhash near-dup: bucketed verify ≡ broadcast verify") {
    val bc = pairsSet(Dedup.nearDupPairs(docsDf, verifyMode = Dedup.VerifyBroadcast))
    val bk = pairsSet(Dedup.nearDupPairs(docsDf, verifyMode = Dedup.VerifyBucketed))
    assert(bc.nonEmpty, "spec needs a non-trivial pair set")
    assert(bk == bc)
  }

  test("ngram near-dup: bucketed verify ≡ broadcast verify") {
    val bc = pairsSet(Dedup.ngramJaccardPairs(docsDf, verifyMode = Dedup.VerifyBroadcast))
    val bk = pairsSet(Dedup.ngramJaccardPairs(docsDf, verifyMode = Dedup.VerifyBucketed))
    assert(bc.nonEmpty, "spec needs a non-trivial pair set")
    assert(bk == bc)
  }

  test("bucketed verify survives with broadcasts disabled: sort-merge plan") {
    // isolated session: suites share one SparkSession and may run in
    // parallel — mutating autoBroadcastJoinThreshold on the shared conf
    // would race with concurrent plan-shape assertions
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = s.read.parquet(s"$sf/documents.parquet")
    // threshold distinct from every other suite's: the CacheManager
    // matches cached plans ACROSS sessions ignoring join hints, so a
    // plan another suite cached would silently replace this subtree
    // with an InMemoryTableScan and void the plan assertion
    val q = Dedup.nearDupPairs(docs, threshold = 0.51,
      verifyMode = Dedup.VerifyBucketed)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      "expected sort-merge verify joins in:\n" + plan.take(800))
    assert(q.count() > 0)
  }

  test("unknown verify mode is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.nearDupPairs(docsDf, verifyMode = "banana").count()
    }
  }

  test("auto mode dispatches on planner-estimated corpus size (the measured crossover)") {
    import spark.implicits._
    // tiny corpus -> broadcast verify: the hinted BroadcastHashJoin
    // attaches the dictionary map-side
    val small = Dedup.nearDupPairs(docsDf) // default VerifyAuto
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"),
      "small corpus must ride the broadcast verify:\n" + small.take(600))
    PipelineCaches.release(spark)
    // a frame whose PLANNER ESTIMATE crosses VerifyAutoBytes without
    // materializing anything: 3M synthesized rows x ~100B estimate.
    // Only the PLAN is inspected - the query never runs.
    val big = spark.range(6000000).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta epsilon zeta "), col("id")).as("text"))
    assert(big.queryExecution.optimizedPlan.stats.sizeInBytes > Dedup.VerifyAutoBytes,
      "fixture must cross the auto threshold for this pin to mean anything")
    val bigPlan = Dedup.nearDupPairs(big) // default VerifyAuto
      .queryExecution.executedPlan.toString
    assert(bigPlan.contains("SortMergeJoin"),
      "past the threshold auto must dispatch to the bucketed verify:\n" +
        bigPlan.take(600))
    PipelineCaches.release(spark)
  }
}
