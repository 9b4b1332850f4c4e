package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Laws for embedding-space eval-set decontamination (the semantic
  * complement of the 13-gram contamination operators): the exact form
  * against a driver-side brute force, the IVF-blocked form's recall
  * contract vs the exact form, and the plan postures (broadcast eval
  * side, map-side argmax partials, no corpus-sized window). */
class DeconEmbedSpec extends SparkSuite {

  /** Driver-side brute force over the real sf0.001 embeddings:
    * flagged vec_id -> (nearest eval id, max cosine). */
  private def bruteForce(): Map[Long, (Long, Double)] = {
    val rows = Tables.embeddings(spark, sf).collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), v, math.sqrt(v.map(x => x * x).sum))
    }.filter(_._3 > 0)
    val evals = rows.filter(_._1 % 50 == 0)
    rows.filter(_._1 % 50 != 0).flatMap { case (id, v, n) =>
      val (cs, eid) = evals.map { case (eid, ev, en) =>
        (v.zip(ev).map { case (a, b) => a * b }.sum / (n * en), eid)
      }.maxBy { case (c, e) => (c, -e) }
      if (cs >= 0.3) Some(id -> (eid, cs)) else None
    }.toMap
  }

  test("exact decon matches a driver-side brute force (flag set, argmax, cosine)") {
    val want = bruteForce()
    val got = SimSearch.deconEmbedQ(Tables.embeddings(spark, sf)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet,
      s"flag sets differ: +${(got.keySet -- want.keySet).take(5)} " +
        s"-${(want.keySet -- got.keySet).take(5)}")
    assert(want.nonEmpty, "fixture must flag at least one vector")
    want.foreach { case (id, (eid, cs)) =>
      assert(got(id)._1 == eid, s"argmax eval for $id")
      assert(math.abs(got(id)._2 - cs) <= 5e-7, s"cosine for $id")
    }
    PipelineCaches.release(spark)
  }

  test("IVF decon is a recall-trading subset: flags ⊆ exact flags, cos ≤ exact max") {
    val emb = Tables.embeddings(spark, sf)
    val exact = SimSearch.deconEmbedQ(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ivf = SimSearch.deconEmbedIvfQ(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty, "IVF form must flag at least one vector on the fixture")
    ivf.foreach { case (id, _, cs) =>
      assert(exact.contains(id), s"IVF flagged $id the exact form did not")
      assert(cs <= exact(id) + 1e-9, s"IVF cos exceeds the exact max for $id")
    }
    PipelineCaches.release(spark)
  }

  test("index-backed decon == in-memory IVF form bit-identically; probe scan is cell-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_idx").toString
    val emb = Tables.embeddings(spark, sf)
    SimSearch.writeIvfIndexWith(emb.filter(col("vec_id") % 50 =!= 0),
      SimSearch.sampledCentroids(emb, 16, 1), dir)
    val fromIdx = SimSearch.deconEmbedFromIndexQ(spark, dir, emb)
    val plan = fromIdx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      "index read must carry a cell partition filter:\n" + plan.take(700))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(fromIdx) == rows(SimSearch.deconEmbedIvfQ(emb)),
      "persisted-index decon must equal the in-memory IVF form")
    PipelineCaches.release(spark)
  }

  test("plan posture: broadcast eval side, map-side max_by partials, no corpus window") {
    val plan = SimSearch.deconEmbedQ(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("partial_max_by"),
      "per-vector argmax must fold map-side: " + plan.take(800))
    assert(!plan.contains("Window"),
      "exact decon must not window the corpus-sized frame")
    PipelineCaches.release(spark)
  }
}
