package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Positional phrase-index laws: append == rebuild for any
  * doc-complete split, compaction preserves the postings, the index
  * read equals the batch adjacency pass, the scan is bucket-pruned,
  * and the slot-adjacency math is pinned on constructed docs
  * (m = 3, repeated-token phrases, overlapping matches). */
class PhraseIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private lazy val docs = Tables.documents(spark, sf)

  test("slot-adjacency math: m=3, overlap, repeated-token phrase, 1-based first_pos") {
    val d = Seq(
      (1L, "a b c a b c"),      // "a b c" twice (pos 1 and 4); "b c a" once
      (2L, "x x x"),            // repeated-token phrase "x x" twice (overlap)
      (3L, "a b"),              // too short for any m=3 phrase
      (4L, "c b a")             // reversed: no match
    ).toDF("doc_id", "text")
    val out = PhraseIndex.phraseSearchQ(d, Seq("a b c", "b c a", "x x"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("a b c", 1L)) == (2L, 1L))
    assert(out(("b c a", 1L)) == (1L, 2L))
    assert(out(("x x", 2L)) == (2L, 1L)) // overlapping starts 1 and 2
    assert(!out.contains(("a b c", 3L)) && !out.contains(("a b c", 4L)))
    assert(out.size == 3)
  }

  test("additivity under doc-complete batches: append == rebuild") {
    val incDir = tmp("phr_inc")
    PhraseIndex.writePhraseIndex(docs.filter(col("doc_id") % 3 === 0), incDir)
    PhraseIndex.appendToPhraseIndex(docs.filter(col("doc_id") % 3 === 1), incDir)
    PhraseIndex.appendToPhraseIndex(docs.filter(col("doc_id") % 3 === 2), incDir)
    val rbDir = tmp("phr_rb")
    PhraseIndex.writePhraseIndex(docs, rbDir)
    val inc = PhraseIndex.phrasesFromIndex(spark, incDir)
      .collect().map(_.toString).sorted.toSeq
    val rb = PhraseIndex.phrasesFromIndex(spark, rbDir)
      .collect().map(_.toString).sorted.toSeq
    assert(inc == rb && inc.nonEmpty)
  }

  test("compaction preserves postings; index read == batch adjacency; scan bucket-pruned") {
    val dir = tmp("phr_cmp")
    PhraseIndex.writePhraseIndex(docs.filter(col("doc_id") % 2 === 0), dir)
    PhraseIndex.appendToPhraseIndex(docs.filter(col("doc_id") % 2 =!= 0), dir)
    def filesPerBucket = physicalDir(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("bkt=")).map(
        _.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(filesPerBucket > 1)
    val before = PhraseIndex.phrasesFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    PhraseIndex.compactPhraseIndex(spark, dir)
    val after = PhraseIndex.phrasesFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(filesPerBucket == 1)
    // index read equals the batch form over the same corpus
    val batch = PhraseIndex.phraseSearchQ(docs)
      .collect().map(_.toString).sorted.toSeq
    assert(after == batch && after.nonEmpty)
    // the read must touch only the phrase terms' buckets: the scan's
    // partition filters mention bkt (pruned), not a full-table read
    val plan = PhraseIndex.phrasesFromIndex(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bkt"),
      "phrase read must carry a bkt partition filter")
  }
  test("randomized parity: slot-adjacency match equals the naive gram scan") {
    import spark.implicits._
    // tiny alphabet -> dense overlaps, repeats, and self-overlapping
    // phrases ("a a") — the adversarial regime for positional math
    val rnd = new scala.util.Random(12)
    val alpha = Vector("a", "b", "c")
    val docs = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, Vector.fill(n)(alpha(rnd.nextInt(alpha.size))).mkString(" "))
    }
    val phrases = Seq("a", "a b", "b a", "a a", "c c b", "a b c")
    val got = PhraseIndex.phraseSearchQ(docs.toDF("doc_id", "text"), phrases)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = (for {
      (id, text) <- docs
      ph <- phrases
      toks = text.split(" ").toSeq
      pts = ph.split(" ").toSeq
      starts = (0 to toks.size - pts.size)
        .filter(p => toks.slice(p, p + pts.size) == pts)
      if starts.nonEmpty
    } yield (ph, id) -> (starts.size.toLong, starts.min + 1L)).toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    assert(want.nonEmpty, "the fixture must actually produce matches")
  }
}
