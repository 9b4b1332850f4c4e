package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws for the eighth persisted index (incremental corpus data card):
  * any append sequence equals the batch report over the union,
  * compaction preserves the answer and collapses the per-batch file
  * accumulation, a crash before a compaction swap leaves the old
  * generation readable, and (round 15) right-to-be-forgotten via the
  * in-dir negative-count ledger: forget → read == victim-free rebuild,
  * re-forgetting is idempotent, and compaction purges ledger + zeroed
  * rows in one swap. */
class ReportIndexSpec extends SparkSuite {

  private def reportOf(df: DataFrame): Set[(String, Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("report_idx_spec").toFile
    d.deleteOnExit(); d.getPath + "/idx"
  }

  test("law: index over any append split equals the batch report over the union") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val want = reportOf(TextOps.corpusReportQ(docs))
    val dir = tmp()
    // three uneven batches, including one that re-hosts content across
    // the split boundary (dup counting is corpus-wide, order-free)
    ReportIndex.writeReportIndex(docs.filter(col("doc_id") % 3 === 0), dir)
    ReportIndex.appendToReportIndex(docs.filter(col("doc_id") % 3 === 1), dir)
    ReportIndex.appendToReportIndex(docs.filter(col("doc_id") % 3 === 2), dir)
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == want)
  }

  test("compaction preserves the report and collapses to one file per bucket") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val dir = tmp()
    ReportIndex.writeReportIndex(docs.filter(col("doc_id") % 2 === 0), dir, hashBuckets = 8)
    ReportIndex.appendToReportIndex(docs.filter(col("doc_id") % 2 === 1), dir)
    ReportIndex.appendToReportIndex(docs.limit(0), dir) // empty batch is a no-op
    val before = reportOf(ReportIndex.reportFromIndex(spark, dir))
    ReportIndex.compactReportIndex(spark, dir)
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == before)
    // one data file per touched bucket after compaction
    val bktDirs = physicalDir(dir + "/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
    assert(bktDirs.nonEmpty)
    bktDirs.foreach { b =>
      val parts = b.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${b.getName}: ${parts.length} files after compaction")
    }
  }

  test("crash before the compaction swap leaves the old generation readable") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val dir = tmp()
    ReportIndex.writeReportIndex(docs.filter(col("doc_id") % 2 === 0), dir)
    ReportIndex.appendToReportIndex(docs.filter(col("doc_id") % 2 === 1), dir)
    val before = reportOf(ReportIndex.reportFromIndex(spark, dir))
    case class Boom() extends RuntimeException("injected")
    DirSwap.crashBeforeSwap = Some(_ => throw Boom())
    try intercept[Boom](ReportIndex.compactReportIndex(spark, dir))
    finally DirSwap.crashBeforeSwap = None
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == before,
      "a pre-swap crash must leave the live index untouched")
    // and a retried compaction completes cleanly
    ReportIndex.compactReportIndex(spark, dir)
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == before)
  }

  test("incrementalReportQ equals the batch query over the full fixture") {
    val got = reportOf(ReportIndex.incrementalReportQ(spark, sf))
    val want = reportOf(TextOps.corpusReportQ(
      graft.sources.Tables.documents(spark, sf)))
    assert(got == want)
  }

  test("forget law: netted card == victim-free rebuild; idempotent; " +
    "compaction purges ledger and zeroed rows in one swap") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val victims = docs.filter(col("doc_id") % 17 === 0)
    val survivors = docs.filter(col("doc_id") % 17 =!= 0)
    assert(victims.limit(1).count() == 1, "fixture must have victims")
    val want = reportOf(TextOps.corpusReportQ(survivors))

    val dir = tmp()
    ReportIndex.writeReportIndex(docs.filter(col("doc_id") % 2 === 0), dir,
      hashBuckets = 8)
    ReportIndex.appendToReportIndex(docs.filter(col("doc_id") % 2 === 1), dir)
    ReportIndex.forgetFromReportIndex(spark, dir, victims)
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == want,
      "forgotten docs must leave totals, language inventory, and dup counts")

    // idempotence: re-forgetting the same victims (plus an id never
    // ingested) changes nothing — the registry drops them
    ReportIndex.forgetFromReportIndex(spark, dir,
      victims.unionByName(docs.limit(0)))
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == want,
      "a re-request must not double-subtract")

    // purge: one compaction bakes corrections in and retires the ledger
    ReportIndex.compactReportIndex(spark, dir)
    assert(!new java.io.File(physicalDir(s"$dir/data"), "_deletes").exists(),
      "compaction must retire the forget ledger")
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == want,
      "the purged card must read identically")
    // and post-purge appends keep working
    ReportIndex.appendToReportIndex(victims, dir)
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) ==
      reportOf(TextOps.corpusReportQ(docs)),
      "re-ingesting the victims restores the full-corpus card")
  }

  test("forget request-time crash window: a kill before the ledger " +
    "append commits NOTHING; the retry lands the full request once") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val victims = docs.filter(col("doc_id") % 17 === 0)
    val dir = tmp()
    ReportIndex.writeReportIndex(docs, dir, hashBuckets = 8)
    val before = reportOf(ReportIndex.reportFromIndex(spark, dir))
    case class Killed() extends RuntimeException("injected crash")
    Tombstones.crashBeforeAppend = Some(_ => throw Killed())
    try intercept[Killed](
      ReportIndex.forgetFromReportIndex(spark, dir, victims))
    finally Tombstones.crashBeforeAppend = None
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) == before,
      "a crashed forget request must commit nothing")
    ReportIndex.forgetFromReportIndex(spark, dir, victims)
    assert(reportOf(ReportIndex.reportFromIndex(spark, dir)) ==
      reportOf(TextOps.corpusReportQ(docs.filter(col("doc_id") % 17 =!= 0))),
      "the retried request must land exactly once (no double correction)")
  }

  test("reportForgetQ equals the batch query over the survivors") {
    val got = reportOf(ReportIndex.reportForgetQ(spark, sf))
    val want = reportOf(TextOps.corpusReportQ(
      graft.sources.Tables.documents(spark, sf)
        .filter(col("doc_id") % 17 =!= 0)))
    assert(got == want)
  }
}
