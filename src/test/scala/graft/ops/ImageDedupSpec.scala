package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Behavior laws for perceptual (dHash) payload dedup
  * ([[MultiModal.imageNearDupPairs]]): gradient-hash invariants, the
  * banding-vs-brute-force exactness law, and degenerate-payload pins. */
class ImageDedupSpec extends SparkSuite {
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, String)], maxHamming: Int = 3) =
    MultiModal.imageNearDupPairs(
      MultiModal.withPayload(rows.toDF("doc_id", "text")), maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  // a long "scanline" so the 61 samples land on distinct positions
  private val line = (0 until 200).map(i => ('a' + i % 26).toChar).mkString

  test("identical payloads pair at hamming 0") {
    val out = pairsOf(Seq((1L, line), (2L, line)))
    assert(out == Map((1L, 2L) -> 0L))
  }

  test("a one-byte corruption stays within the hamming budget") {
    val corrupted = line.updated(100, '~')
    val out = pairsOf(Seq((1L, line), (2L, corrupted)))
    assert(out.contains((1L, 2L)))
    assert(out((1L, 2L)) <= 3L)
  }

  test("dHash is invariant to a global brightness shift (gradient hash)") {
    // shifting every code point by +1 preserves all pairwise orderings
    val shifted = line.map(c => (c + 1).toChar).mkString
    val out = pairsOf(Seq((1L, line), (2L, shifted)))
    assert(out == Map((1L, 2L) -> 0L))
  }

  test("unrelated payloads do not pair") {
    // reversing flips every gradient comparison -> hamming ~ 60
    val out = pairsOf(Seq((1L, line), (2L, line.reverse)))
    assert(out.isEmpty)
  }

  test("banded join equals brute force at the pigeonhole bound") {
    val rows = Seq(
      (1L, line), (2L, line.updated(50, '~')), (3L, line.updated(7, '!')),
      (4L, line.reverse), (5L, (0 until 200).map(i => ('z' - i % 26).toChar).mkString))
    val banded = pairsOf(rows)
    // brute force over the same fingerprints
    val fp = MultiModal.withPayload(rows.toDF("doc_id", "text"))
      .select(col("doc_id"), MultiModal.dHash(decode(col("payload"), "UTF-8")).as("fp"))
    val a = fp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = fp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(fp_a ^ fp_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(banded == brute)
  }

  test("degenerate payloads: empty excluded, one-byte payload hashes to 0") {
    val out = pairsOf(Seq((1L, ""), (2L, ""), (3L, "x"), (4L, "y")))
    // empties are filtered (no samples); 1-char payloads have constant
    // sample sequences -> fp 0 -> they pair with each other at hamming 0
    assert(out == Map((3L, 4L) -> 0L))
  }

  test("query fixture: every document pairs with its re-encoded variant") {
    val docs = Seq(
      (1L, line), (2L, line.reverse),
      (3L, (0 until 150).map(i => ('m' + i % 13).toChar).mkString))
      .toDF("doc_id", "text")
    val out = MultiModal.imageDedupQ(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 100001L), (2L, 100002L), (3L, 100003L)).subsetOf(out))
    // no original-original pairs on these dissimilar payloads
    assert(!out.exists { case (a, b) => a < 100000L && b < 100000L })
  }

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def pairsIdx(df: org.apache.spark.sql.DataFrame) = {
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    PipelineCaches.release(spark)
    out
  }

  test("index lookup == banded batch join restricted to (index, delta) pairs") {
    val base = Seq((1L, line), (2L, line.reverse),
      (3L, (0 until 150).map(i => ('m' + i % 13).toChar).mkString))
      .toDF("doc_id", "text")
    val delta = Seq(
      (101L, line.updated(40, '!')),      // near-dup of doc 1
      (102L, "something else entirely that matches nothing at all ok"))
      .toDF("doc_id", "text")
    val dir = tmp("img_idx")
    MultiModal.writeImageIndex(MultiModal.withPayload(base), dir)
    val got = pairsIdx(
      MultiModal.imageNearDupsAgainstIndex(spark, MultiModal.withPayload(delta), dir))
    val batch = pairsOf(Seq((1L, line), (2L, line.reverse),
      (3L, (0 until 150).map(i => ('m' + i % 13).toChar).mkString),
      (101L, line.updated(40, '!')),
      (102L, "something else entirely that matches nothing at all ok")))
      .filter { case ((a, b), _) => a <= 3L && b >= 101L }
    assert(got == batch)
    assert(got.contains((1L, 101L)), "the near-dup delta payload must hit its original")
  }

  test("image index: append == rebuild; compaction preserves and collapses files") {
    val a = Seq((1L, line), (2L, line.reverse)).toDF("doc_id", "text")
    val b = Seq((3L, line.updated(7, '#'))).toDF("doc_id", "text")
    val delta = Seq((200L, line.updated(100, '~'))).toDF("doc_id", "text")
    val incrDir = tmp("img_incr")
    MultiModal.writeImageIndex(MultiModal.withPayload(a), incrDir)
    MultiModal.appendToImageIndex(MultiModal.withPayload(b), incrDir)
    val rebuiltDir = tmp("img_rebuilt")
    MultiModal.writeImageIndex(MultiModal.withPayload(a.union(b)), rebuiltDir)
    val dp = MultiModal.withPayload(delta)
    val viaAppend = pairsIdx(MultiModal.imageNearDupsAgainstIndex(spark, dp, incrDir))
    assert(viaAppend ==
      pairsIdx(MultiModal.imageNearDupsAgainstIndex(spark, dp, rebuiltDir)))
    def parquetFiles(d: String) =
      physicalDir(s"$d/bands").listFiles((f: java.io.File) => f.isDirectory)
        .flatMap(_.listFiles((f: java.io.File) => f.getName.endsWith(".parquet"))).length
    val before = parquetFiles(incrDir)
    MultiModal.compactImageIndex(spark, incrDir)
    assert(parquetFiles(incrDir) < before,
      "compaction must collapse the per-batch file accumulation")
    assert(viaAppend ==
      pairsIdx(MultiModal.imageNearDupsAgainstIndex(spark, dp, incrDir)))
  }

  test("index lookup reads only touched buckets (PartitionFilters pin)") {
    val base = (1L to 20L).map(i =>
      (i, (0 until 150).map(j => ('a' + (i + j) % 26).toChar).mkString))
      .toDF("doc_id", "text")
    val dir = tmp("img_prune")
    MultiModal.writeImageIndex(MultiModal.withPayload(base), dir)
    val delta = Seq((500L, (0 until 150).map(j => ('a' + (1 + j) % 26).toChar).mkString))
      .toDF("doc_id", "text")
    val plan = MultiModal.imageNearDupsAgainstIndex(spark,
      MultiModal.withPayload(delta), dir).queryExecution.executedPlan.toString
    PipelineCaches.release(spark)
    val scanLine = plan.linesIterator.find(l =>
      l.contains("FileScan") && l.contains("bands")).getOrElse("")
    assert(scanLine.contains("PartitionFilters: [bkt"),
      s"image index scan must carry a bucket partition filter:\n$scanLine")
  }

  test("plan: banded equi-join, no cartesian product") {
    val plan = MultiModal.imageNearDupPairs(
      MultiModal.withPayload(Seq((1L, line)).toDF("doc_id", "text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
  test("video frame dedup: variant pairs surface, frames gate the bar, df cap prunes") {
    import spark.implicits._
    // 64-char distinct-prefix texts -> 5 frames each; the mid-corrupted
    // variant shares the frames clear of the corrupted byte
    val d = (0L to 3L).map(i =>
      (i, s"doc$i " + (1 to 12).map(k => f"w$i%02d$k%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val out = MultiModal.videoFrameDedupQ(d, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every (base, variant) pair present. (Cross-doc pairs MAY also
    // surface: dHash is a gradient hash, so structurally identical
    // frames with shifted alphabets legitimately share fingerprints —
    // collision semantics are part of the declared operator, and the
    // oracle replays them exactly.)
    assert((0L to 3L).forall(i => out.contains((i, i + 100000L))),
      s"variant pairs missing: ${out.keySet}")
    // a frame shared by MORE than dfCap videos is dropped by declared
    // semantics: every doc identical -> single shared frame set, cap 3
    // excludes the 8-video fingerprint groups entirely
    val same = (0L to 3L).map(i => (i, "x " * 40)).toDF("doc_id", "text")
    assert(MultiModal.videoFrameDedupQ(same, minShared = 1, dfCap = 3).isEmpty)
  }
}
