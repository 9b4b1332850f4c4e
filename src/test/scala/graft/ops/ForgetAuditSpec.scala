package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws for the tombstone-debt audit: exact victim/correction counts
  * against known drill states in BOTH forget families, debt goes to
  * zero after the purging compaction, and an absent index dir reads as
  * a healthy zero row (no throw). All driver-side metadata — the spec
  * also pins that the audit runs zero Spark jobs. */
class ForgetAuditSpec extends SparkSuite {
  import spark.implicits._

  private def docText(i: Long) =
    s"audit token$i alpha beta gamma delta shared tail v${i % 3}"
  private val docs: DataFrame =
    (1L to 60L).map(i => (i, docText(i))).toDF("doc_id", "text")

  private def tmp(pfx: String): String = {
    val d = java.nio.file.Files.createTempDirectory(pfx)
    java.nio.file.Files.delete(d); d.toString
  }

  private def auditRow(name: String, dir: String): Row =
    ForgetAudit.forgetAudit(spark, Seq(name -> dir)).head()

  test("tombstone family (text index): victims counted exactly, purge " +
    "zeroes the debt, oldest==newest after compaction") {
    val dir = tmp("fa_text")
    TextIndex.writeTextIndex(docs, dir)
    val clean = auditRow("t", dir)
    assert(clean.getLong(4) == 0L && clean.getLong(5) == 0L &&
      clean.getLong(6) == 0L, "no debt before any forget")
    assert(clean.getLong(3) > 0L, "live rows visible from footers")

    TextIndex.forgetFromTextIndex(spark, dir,
      docs.filter(col("doc_id") % 5 === 0).select("doc_id"))
    val debt = auditRow("t", dir)
    assert(debt.getLong(4) == 12L,
      s"12 tombstoned victims expected, got ${debt.getLong(4)}")
    assert(debt.getLong(6) > 0L, "ledger bytes visible")

    TextIndex.compactTextIndex(spark, dir)
    val purged = auditRow("t", dir)
    assert(purged.getLong(4) == 0L && purged.getLong(6) == 0L,
      "compaction purges the tombstone table")
    assert(purged.getLong(3) < clean.getLong(3),
      "purged index holds fewer live rows than the pre-forget build")
  }

  test("negative-correction family (LM index): registry vs correction " +
    "rows split via footer null counts; purge zeroes both") {
    val dir = tmp("fa_lm")
    val en = docs.withColumn("lang", lit("en"))
    LmIndex.writeLmIndex(en, dir)
    LmIndex.forgetFromLmIndex(spark, dir, en.filter(col("doc_id") % 5 === 0))
    val debt = auditRow("lm", dir)
    assert(debt.getLong(4) == 12L,
      s"12 registry victims expected, got ${debt.getLong(4)}")
    assert(debt.getLong(5) > 0L,
      "the victims' count contribution rides as null-id correction rows")
    // idempotent re-request adds nothing
    LmIndex.forgetFromLmIndex(spark, dir, en.filter(col("doc_id") % 5 === 0))
    assert(auditRow("lm", dir).getLong(4) == 12L,
      "re-forgetting must not inflate the registry")

    LmIndex.compactLmIndex(spark, dir)
    val purged = auditRow("lm", dir)
    assert(purged.getLong(4) == 0L && purged.getLong(5) == 0L &&
      purged.getLong(6) == 0L, "one swap retires counts and ledger")
  }

  test("report index (round-15 family member) and multi-index frame; " +
    "absent dir is a healthy zero row; the audit runs zero Spark jobs") {
    val repDir = tmp("fa_rep")
    val rep = docs.withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("s"), col("doc_id") % 3))
    ReportIndex.writeReportIndex(rep, repDir, hashBuckets = 8)
    ReportIndex.forgetFromReportIndex(spark, repDir,
      rep.filter(col("doc_id") % 5 === 0))

    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val frame = ForgetAudit.forgetAudit(spark,
      Seq("report" -> repDir, "ghost" -> (repDir + "_never_built")))
    val rows = frame.collect().map(r => r.getString(0) -> r).toMap
    // LocalRelation collect — no job may have been scheduled
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "the audit must run zero Spark jobs")

    assert(rows("report").getLong(4) == 12L)
    assert(rows("report").getLong(5) > 0L)
    val ghost = rows("ghost")
    (1 to 8).foreach(i => assert(ghost.getLong(i) == 0L,
      s"absent dir must audit as zero, col $i = ${ghost.getLong(i)}"))

    ReportIndex.compactReportIndex(spark, repDir)
    assert(auditRow("report", repDir).getLong(4) == 0L,
      "report-index compaction purges its ledger")
  }
}
