package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Persisted transition-edge index laws: append == rebuild for any
  * USER-COMPLETE split (the declared append contract), compaction
  * preserves the fold, and the incremental rank read equals the batch
  * PageRank over the union. */
class EdgeIndexSpec extends SparkSuite {

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private lazy val events = Tables.events(spark, sf)

  test("additivity under user-complete batches: append == rebuild") {
    val incDir = tmp("ei_inc")
    EdgeIndex.writeEdgeIndex(events.filter(col("user_id") % 3 === 0), incDir)
    EdgeIndex.appendToEdgeIndex(events.filter(col("user_id") % 3 === 1), incDir)
    EdgeIndex.appendToEdgeIndex(events.filter(col("user_id") % 3 === 2), incDir)
    val rbDir = tmp("ei_rb")
    EdgeIndex.writeEdgeIndex(events, rbDir)
    val inc = EdgeIndex.edgesFromIndex(spark, incDir)
      .collect().map(_.toString).sorted.toSeq
    val rb = EdgeIndex.edgesFromIndex(spark, rbDir)
      .collect().map(_.toString).sorted.toSeq
    assert(inc == rb && inc.nonEmpty)
  }

  test("compaction preserves the folded edges and collapses files") {
    val dir = tmp("ei_cmp")
    EdgeIndex.writeEdgeIndex(events.filter(col("user_id") % 2 === 0), dir)
    EdgeIndex.appendToEdgeIndex(events.filter(col("user_id") % 2 =!= 0), dir)
    val before = EdgeIndex.edgesFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    def nFiles = physicalDir(s"$dir/edges").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles > 1)
    EdgeIndex.compactEdgeIndex(spark, dir)
    val after = EdgeIndex.edgesFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(nFiles == 1)
  }

  test("incremental rank read equals the batch PageRank over the union") {
    val dir = tmp("ei_rank")
    EdgeIndex.writeEdgeIndex(events.filter(col("user_id") % 4 =!= 0), dir)
    EdgeIndex.appendToEdgeIndex(events.filter(col("user_id") % 4 === 0), dir)
    val inc = EdgeIndex.pageRankFromIndex(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toList
    PipelineCaches.release(spark)
    val batch = EventAnalytics.pageRankQ(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toList
    PipelineCaches.release(spark)
    assert(inc == batch)
  }

  test("user-forget: netted reads equal a victim-free rebuild across all " +
    "three analyses; re-forget is a no-op; the compaction swap bakes " +
    "the ledger and erases victim-only edges") {
    val victims = events.filter(col("user_id") % 7 === 0)
    val survivors = events.filter(col("user_id") % 7 =!= 0)
    val live = tmp("ei_fg")
    EdgeIndex.writeEdgeIndex(events.filter(col("user_id") % 2 === 0), live)
    EdgeIndex.appendToEdgeIndex(events.filter(col("user_id") % 2 === 1), live)
    val before = EdgeIndex.pageRankFromIndex(spark, live)
      .collect().map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    EdgeIndex.forgetFromEdgeIndex(spark, live, victims)
    val ref = tmp("ei_fg_ref")
    EdgeIndex.writeEdgeIndex(survivors, ref)
    def reads(dir: String): Seq[Seq[String]] = {
      val edges = PipelineCaches.track(EdgeIndex.edgesFromIndex(spark, dir))
      val r = Seq(
        EventAnalytics.rankEdges(edges).collect().map(_.toString).sorted.toSeq,
        EventAnalytics.hitsEdges(edges).collect().map(_.toString).sorted.toSeq,
        EventAnalytics.propagateLabels(EventAnalytics.symmetrize(edges))
          .collect().map(_.toString).sorted.toSeq)
      PipelineCaches.release(spark)
      r
    }
    val want = reads(ref)
    assert(reads(live) == want,
      "netted reads must equal the victim-free rebuild on all analyses")
    assert(want.head != before, "drill is vacuous — forgetting moved nothing")
    EdgeIndex.forgetFromEdgeIndex(spark, live, victims)
    assert(reads(live) == want, "re-forget must be a no-op")
    EdgeIndex.compactEdgeIndex(spark, live)
    assert(reads(live) == want, "the purge must not move a score")
    assert(!new java.io.File(physicalDir(s"$live/edges"), "_deletes").exists(),
      "the compaction swap must retire the ledger")
    val liveEdges = EdgeIndex.edgesFromIndex(spark, live)
      .collect().map(_.toString).sorted.toSeq
    val refEdges = EdgeIndex.edgesFromIndex(spark, ref)
      .collect().map(_.toString).sorted.toSeq
    assert(liveEdges == refEdges,
      "purged edge table must equal a victim-free rebuild's")
  }

  test("one edge store, three link analyses: HITS and LPA reads equal " +
    "their batch forms, before and after compaction") {
    val dir = tmp("ei_multi")
    EdgeIndex.writeEdgeIndex(events.filter(col("user_id") % 2 === 0), dir)
    EdgeIndex.appendToEdgeIndex(events.filter(col("user_id") % 2 === 1), dir)
    def hitsRead() = {
      val r = EventAnalytics.hitsEdges(EdgeIndex.edgesFromIndex(spark, dir))
        .collect().map(_.toString).sorted.toSeq
      PipelineCaches.release(spark); r
    }
    def lpaRead() = {
      val r = EventAnalytics.propagateLabels(EventAnalytics.symmetrize(
        EdgeIndex.edgesFromIndex(spark, dir)))
        .collect().map(_.toString).sorted.toSeq
      PipelineCaches.release(spark); r
    }
    val wantHits = EventAnalytics.hitsQ(events).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    val wantLpa = EventAnalytics.labelPropQ(events).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    assert(hitsRead() == wantHits && wantHits.nonEmpty)
    assert(lpaRead() == wantLpa && wantLpa.nonEmpty)
    EdgeIndex.compactEdgeIndex(spark, dir)
    assert(hitsRead() == wantHits, "compaction must not move a score")
    assert(lpaRead() == wantLpa, "compaction must not move a community")
  }
}
