package graft.ops

import graft.SparkSuite

/** kNN label-propagation laws: the distributed result must equal an
  * exact driver-side replay (same left-to-right IEEE dot fold, same
  * sim-then-id and votes-then-label tie discipline), vote ties must
  * break to the smaller label, and the top-k must run as the partial
  * bounded-buffer aggregate — never a full-sim-matrix window sort. */
class KnnClassifySpec extends SparkSuite {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  test("driver replay: predictions match exact brute-force kNN (k=5, mod 10)") {
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong))
      .filter { case (_, v, _) => dot(v, v) > 0 }
    val probes = rows.filter(_._1 % 10 == 0)
    val labeled = rows.filter(_._1 % 10 != 0)
    val want = probes.map { case (pid, pv, _) =>
      val pn = math.sqrt(dot(pv, pv))
      val sims = labeled.map { case (cid, cv, lab) =>
        (cid, lab, dot(cv, pv) / (math.sqrt(dot(cv, cv)) * pn))
      }
      val topk = sims.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._3, b._3)
        c > 0 || (c == 0 && a._1 < b._1)
      }.take(5)
      val votes = topk.groupBy(_._2).map { case (lab, xs) => (lab, xs.length) }
      val (lab, n) = votes.toSeq.sortWith { (a, b) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      }.head
      (pid, lab, n.toLong)
    }.toSet
    val got = SimSearch.knnClassifyQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("vote ties break to the smaller label") {
    import spark.implicits._
    // probe 0; four labeled neighbors split 2-2 between labels 5 and 3
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 9),
      (1L, Array(1.0f, 0.1f), 5),
      (2L, Array(1.0f, 0.2f), 5),
      (3L, Array(1.0f, 0.3f), 3),
      (4L, Array(1.0f, 0.4f), 3)
    ).toDF("vec_id", "embedding", "label")
    val out = SimSearch.knnClassify(df, k = 4).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 0L)
    assert(out.head.getLong(1) == 3L, "2-2 vote must resolve to the smaller label")
    assert(out.head.getLong(2) == 2L)
  }

  test("label outside [0,16) fails loudly instead of corrupting the tag packing") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(1.0f, 0.1f), 17)
    ).toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception] {
      SimSearch.knnClassify(df, k = 1).collect()
    }
    assert(ex.getMessage != null)
  }

  test("plan: top-k rides the partial bounded-buffer aggregate") {
    val plan = SimSearch.knnClassifyQ(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg"), plan.take(800))
  }

  test("cell-pruned kNN: driver replay with the identical blocking (k=5, mod 10)") {
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2).toLong))
      .filter { case (_, v, _) => dot(v, v) > 0 }
    val withNrm = rows.map { case (id, v, lab) => (id, v, lab, math.sqrt(dot(v, v))) }
    val cents = withNrm.filter(r => r._1 >= 5 && r._1 < 21)
    // nearest-sampled-centroid assignment, sim desc then cell asc ties
    val asg = withNrm.map { case (id, v, lab, nrm) =>
      val cell = cents.map { case (c, cv, _, cn) => (c, dot(v, cv) / (nrm * cn)) }
        .sortWith { (a, b) =>
          val c = java.lang.Double.compare(a._2, b._2)
          c > 0 || (c == 0 && a._1 < b._1)
        }.head._1
      (id, v, lab, nrm, cell)
    }
    val probes = asg.filter(_._1 % 10 == 0)
    val labeled = asg.filter(_._1 % 10 != 0)
    val byCell = labeled.groupBy(_._5)
    val want = probes.flatMap { case (pid, pv, _, pn, cell) =>
      byCell.get(cell).filter(_.nonEmpty).map { cand =>
        val topk = cand.map { case (cid, cv, lab, cn, _) =>
          (cid, lab, dot(cv, pv) / (cn * pn))
        }.sortWith { (a, b) =>
          val c = java.lang.Double.compare(a._3, b._3)
          c > 0 || (c == 0 && a._1 < b._1)
        }.take(5)
        val (lab, n) = topk.groupBy(_._2).map { case (l, xs) => (l, xs.length) }
          .toSeq.sortWith { (a, b) =>
            a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
          }.head
        (pid, lab, n.toLong)
      }
    }.toSet
    val got = SimSearch.knnClassifyIvfQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    try assert(got == want)
    finally PipelineCaches.release(spark)
  }

  test("cell-pruned kNN: candidate join is an equi join, top-k stays partial") {
    val plan = SimSearch.knnClassifyIvfQ(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg"), plan.take(800))
    // the probe-candidate meet must be a hash/merge EQUI join on cell
    // (the only BNLJs are the 16-row centroid broadcast, whose cached
    // subtree prints once per reference); a cross/nested-loop meet over
    // the corpus would be the scale bug this guards against
    assert(Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
      .exists(plan.contains), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    PipelineCaches.release(spark)
  }
}
