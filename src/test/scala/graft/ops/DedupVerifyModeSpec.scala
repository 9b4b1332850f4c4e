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

  test("auto mode measures the dictionary DIRECTLY: a stats-hostile " +
    "(expression-backed) corpus dispatches to SMJ where the old " +
    "plan-stats gate would have broadcast (round-16 VERDICT #2)") {
    // fixture dispatch unchanged: the real (file-backed) tiny corpus
    // rides the broadcast verify
    val small = Dedup.nearDupPairs(docsDf) // default VerifyAuto
      .queryExecution.executedPlan.toString
    assert(small.contains("BroadcastHashJoin"),
      "small corpus must ride the broadcast verify:\n" + small.take(600))
    PipelineCaches.release(spark)
    // the 64x-ScaleSmoke shape in miniature: a generated corpus whose
    // planner estimate UNDER-counts its real token mass (the round-16
    // audit measured every 64x probe reading <= 16.3 MB of plan-stats
    // while the broadcast dictionary spilled 5.89 GiB). The gate is
    // shrunk so the fixture stays unit-test-sized; the premise checks
    // keep the pin honest.
    val big = graft.ScaleSmoke.survivableCorpus(spark, 5000, 2)
    val dictBound = Dedup.tokens(big).count() * 8L
    val gate = dictBound / 2 // a dictionary decisively past the gate
    assert(big.queryExecution.optimizedPlan.stats.sizeInBytes <= gate,
      "fixture premise: the planner estimate must sit UNDER the gate " +
        "(the old gate would have chosen broadcast) — " +
        s"est=${big.queryExecution.optimizedPlan.stats.sizeInBytes} gate=$gate")
    assert(Dedup.verifyModeFor(big, gate) == Dedup.VerifyBucketed,
      "the dictionary-bound gate must dispatch the stats-hostile " +
        "corpus to the bucketed (SMJ) verify")
    PipelineCaches.release(spark)
  }

  test("no metadata fast path for dup-heavy parquet (round-17 VERDICT " +
    "#1): a tiny-on-disk dictionary-encoded corpus whose real token " +
    "mass exceeds the gate dispatches to the bucketed (measured) " +
    "verify — on-disk bytes and footer sizes are both post-encoding " +
    "and must not argue a broadcast") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dup_heavy").toString
    val line = (1 to 200).map(i => s"tok$i").mkString(" ")
    (1L to 2000L).map(i => (i, line)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val gate = 1L << 20
    val onDisk = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(onDisk * 20 <= gate,
      "fixture premise: tiny on disk — the retired x20 fast path would " +
        s"have broadcast (onDisk=$onDisk)")
    val dictBound = Dedup.tokens(docs).count() * 8L
    assert(dictBound > gate,
      s"fixture premise: real dictionary past the gate ($dictBound)")
    assert(Dedup.verifyModeFor(docs, gate) == Dedup.VerifyBucketed,
      "dup-heavy tiny-on-disk corpus must dispatch to the measured SMJ verify")
    PipelineCaches.release(spark)
  }
}
