package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Persisted bigram-LM index laws: append == rebuild for any
  * doc-complete split, compaction preserves the fold, and the
  * incremental score read equals the batch ngramLmQ over the union. */
class LmIndexSpec extends SparkSuite {

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private lazy val docs = Tables.documents(spark, sf)

  test("additivity under doc-complete batches: append == rebuild") {
    val incDir = tmp("lm_inc")
    LmIndex.writeLmIndex(docs.filter(col("doc_id") % 3 === 0), incDir)
    LmIndex.appendToLmIndex(docs.filter(col("doc_id") % 3 === 1), incDir)
    LmIndex.appendToLmIndex(docs.filter(col("doc_id") % 3 === 2), incDir)
    val rbDir = tmp("lm_rb")
    LmIndex.writeLmIndex(docs, rbDir)
    val inc = LmIndex.modelFromIndex(spark, incDir)
      .collect().map(_.toString).sorted.toSeq
    val rb = LmIndex.modelFromIndex(spark, rbDir)
      .collect().map(_.toString).sorted.toSeq
    assert(inc == rb && inc.nonEmpty)
  }

  test("compaction preserves the folded model and collapses per-batch files") {
    val dir = tmp("lm_cmp")
    LmIndex.writeLmIndex(docs.filter(col("doc_id") % 2 === 0), dir)
    LmIndex.appendToLmIndex(docs.filter(col("doc_id") % 2 =!= 0), dir)
    val before = LmIndex.modelFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    def filesPerBucket = physicalDir(s"$dir/counts").listFiles()
      .filter(_.getName.startsWith("bkt=")).map(
        _.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(filesPerBucket > 1)
    LmIndex.compactLmIndex(spark, dir)
    val after = LmIndex.modelFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(filesPerBucket == 1)
  }

  test("incremental score read equals the batch ngramLmQ over the union") {
    val dir = tmp("lm_score")
    LmIndex.writeLmIndex(docs.filter(col("doc_id") % 4 =!= 0), dir)
    LmIndex.appendToLmIndex(docs.filter(col("doc_id") % 4 === 0), dir)
    val inc = LmIndex.scoreFromIndex(spark, dir, docs).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    val batch = Scoring.ngramLmQ(docs).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    assert(inc == batch && inc.nonEmpty)
  }

  test("the SAME index serves the Kneser-Ney law: index read == batch " +
    "kneserNeyQ, before and after compaction") {
    val dir = tmp("lm_kn")
    LmIndex.writeLmIndex(docs.filter(col("doc_id") % 4 =!= 0), dir)
    LmIndex.appendToLmIndex(docs.filter(col("doc_id") % 4 === 0), dir)
    val batch = Scoring.kneserNeyQ(docs).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    val inc = LmIndex.kneserNeyFromIndex(spark, dir, docs).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    assert(inc == batch && inc.nonEmpty,
      "KN from the folded count store must equal the batch scorer")
    LmIndex.compactLmIndex(spark, dir)
    val post = LmIndex.kneserNeyFromIndex(spark, dir, docs).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    assert(post == batch, "compaction must not change a single KN score")
  }
}
