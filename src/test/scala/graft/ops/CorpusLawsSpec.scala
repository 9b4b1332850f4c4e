package graft.ops

import graft.SparkSuite
import graft.sources.Tables

/** Laws for the round-14 corpus-statistics operators — readability,
  * Zipf/Heaps fits, the KMV overlap sketch, hard-negative mining —
  * checked against driver-side references on the real sf0.001 tables. */
class CorpusLawsSpec extends SparkSuite {

  private def wsToks(s: String): Array[String] =
    s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  test("readabilityQ matches the driver-side Flesch formula; bands follow the rounded score") {
    val docs = Tables.documents(spark, sf)
    val want = docs.select("doc_id", "text").collect().map { r =>
      val text = r.getString(1)
      val w = wsToks(text).length.toLong
      val sents = math.max("[.!?]+".r.findAllIn(text).length.toLong, 1L)
      val syll = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      val flesch = if (w == 0) None
        else Some(BigDecimal(206.835 - 1.015 * (w.toDouble / sents)
          - 84.6 * (syll.toDouble / w)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      r.getLong(0) -> (w, sents, syll, flesch)
    }.toMap
    val got = TextOps.readabilityQ(docs).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (w, s2, sy, fl) = want(r.getLong(0))
      assert(r.getLong(1) == w && r.getLong(2) == s2 && r.getLong(3) == sy,
        s"counts for doc ${r.getLong(0)}")
      fl match {
        case None => assert(r.isNullAt(4) && r.getString(5) == "empty")
        case Some(f) =>
          assert(math.abs(r.getDouble(4) - f) < 1e-9, s"flesch for doc ${r.getLong(0)}")
          val band = if (f >= 70.0) "easy" else if (f >= 50.0) "standard"
            else if (f >= 30.0) "difficult" else "very_difficult"
          assert(r.getString(5) == band, s"band for doc ${r.getLong(0)}")
      }
    }
  }

  test("zipfQ: OLS matches a driver-side fit; natural-text slope is negative") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.select("source", "text").collect()
      .flatMap(r => wsToks(r.getString(1)).map(t => (r.getString(0), t)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
      .filter(_._2 >= 5)
    val want = counts.groupBy(_._1._1).map { case (s, m) =>
      val ranked = m.toSeq.map { case ((_, t), c) => (t, c) }
        .sortBy { case (t, c) => (-c, t) }.zipWithIndex
        .map { case ((_, c), i) => (math.log((i + 1).toDouble), math.log(c.toDouble)) }
      val n = ranked.length.toDouble
      val (sx, sy) = (ranked.map(_._1).sum, ranked.map(_._2).sum)
      val sxy = ranked.map(p => p._1 * p._2).sum
      val sxx = ranked.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      s -> (ranked.length.toLong, m.values.sum, slope)
    }
    val got = TextOps.zipfQ(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (s, (nt, ntok, slope)) =>
      val (gnt, gntok, gslope, gr2) = got(s)
      assert(gnt == nt && gntok == ntok, s"counts for $s")
      assert(math.abs(gslope - slope) < 1e-4, s"slope for $s: $gslope vs $slope")
      assert(gslope < 0.0, s"Zipf slope must be negative for $s")
      assert(gr2 >= 0.0 && gr2 <= 1.0, s"r2 in [0,1] for $s")
    }
  }

  test("heapsQ: curve is monotone and lands exactly on the corpus totals") {
    val docs = Tables.documents(spark, sf)
    val rows = docs.select("doc_id", "text").collect()
    val totalTok = rows.map(r => wsToks(r.getString(1)).length.toLong).sum
    val totalVocab = rows.flatMap(r => wsToks(r.getString(1))).distinct.length.toLong
    val got = TextOps.heapsQ(docs).orderBy("bucket").collect()
    assert(got.nonEmpty && got.length <= 100)
    val ct = got.map(_.getLong(1))
    val cv = got.map(_.getLong(2))
    assert(ct.zip(ct.tail).forall { case (a, b) => a <= b }, "cum_tokens monotone")
    assert(cv.zip(cv.tail).forall { case (a, b) => a <= b }, "cum_vocab monotone")
    assert(ct.last == totalTok, s"final cum_tokens ${ct.last} != $totalTok")
    assert(cv.last == totalVocab, s"final cum_vocab ${cv.last} != $totalVocab")
    // new-vocab credit can never exceed tokens seen
    got.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("kmvOverlapQ: hash-count audit columns match; estimates within the KMV error law") {
    val docs = Tables.documents(spark, sf)
    val sets = docs.select("source", "text").collect()
      .flatMap(r => wsToks(r.getString(1)).map(t => (r.getString(0), t)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val got = TextOps.kmvOverlapQ(docs).collect()
    val slices = sets.keySet.toSeq.sorted
    assert(got.length == slices.combinations(2).length, "one row per unordered pair")
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, "pair emitted once, ordered")
      // exact per-slice counts ride the same aggregate (52-bit hash
      // collisions would collapse counts — none on this vocab)
      assert(r.getLong(2) == sets(a).size.toLong, s"n_a_hashes for ($a,$b)")
      assert(r.getLong(3) == sets(b).size.toLong, s"n_b_hashes for ($a,$b)")
      val kUsed = r.getLong(4)
      assert(kUsed <= 256L && r.getLong(5) <= kUsed)
      val unionTrue = (sets(a) ++ sets(b)).size.toDouble
      val jaccTrue = (sets(a) & sets(b)).size.toDouble / unionTrue
      // 3/sqrt(k) ≈ 0.19 relative/absolute — generous deterministic
      // fixture bound (observed well inside)
      assert(math.abs(r.getDouble(6) - unionTrue) <= 3.0 / math.sqrt(256.0) * unionTrue + 1,
        s"union_est ${r.getDouble(6)} vs $unionTrue for ($a,$b)")
      assert(math.abs(r.getDouble(7) - jaccTrue) <= 3.0 / math.sqrt(256.0) + 1e-9,
        s"jaccard_est ${r.getDouble(7)} vs $jaccTrue for ($a,$b)")
    }
    PipelineCaches.release(spark)
  }

  test("sourceDriftQ matches a direct driver-side Jensen-Shannon computation, in [0, ln 2]") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.select("source", "text").collect()
      .flatMap(r => wsToks(r.getString(1)).map(t => (r.getString(0), t)))
      .groupBy(_._1).map { case (s, g) =>
        s -> g.map(_._2).groupBy(identity).map { case (t, o) => t -> o.length.toLong }
      }
    def js(a: Map[String, Long], b: Map[String, Long]): Double = {
      val (na, nb) = (a.values.sum.toDouble, b.values.sum.toDouble)
      def h(m: Map[String, Double]): Double =
        -m.values.filter(_ > 0).map(p => p * math.log(p)).sum
      val pa = a.map { case (t, c) => t -> c / na }
      val pb = b.map { case (t, c) => t -> c / nb }
      val mix = (pa.keySet ++ pb.keySet).map(t =>
        t -> (pa.getOrElse(t, 0.0) + pb.getOrElse(t, 0.0)) / 2).toMap
      h(mix) - (h(pa) + h(pb)) / 2
    }
    val got = TextOps.sourceDriftQ(docs).collect()
    val slices = counts.keySet.toSeq.sorted
    assert(got.length == slices.combinations(2).length)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      assert(r.getLong(2) == counts(a).values.sum && r.getLong(3) == counts(b).values.sum)
      assert(r.getLong(4) == (counts(a).keySet & counts(b).keySet).size.toLong)
      val want = js(counts(a), counts(b))
      assert(math.abs(r.getDouble(5) - want) < 5e-7, s"js($a,$b): ${r.getDouble(5)} vs $want")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= math.log(2.0) + 1e-9)
      assert(math.abs(r.getDouble(6) - want / math.log(2.0)) < 5e-7)
    }
    PipelineCaches.release(spark)
  }

  test("ksTestQ matches a driver-side two-sample KS over the length grid") {
    val docs = Tables.documents(spark, sf)
    val vals = docs.select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sorted }
    def ks(a: Seq[Long], b: Seq[Long]): Double = {
      val grid = (a ++ b).distinct.sorted
      grid.map(x => math.abs(
        a.count(_ <= x).toDouble / a.length -
          b.count(_ <= x).toDouble / b.length)).max
    }
    val got = Scoring.ksTestQ(docs).collect()
    val slices = vals.keySet.toSeq.sorted
    assert(got.length == slices.combinations(2).length)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      assert(r.getLong(2) == vals(a).length.toLong && r.getLong(3) == vals(b).length.toLong)
      val want = ks(vals(a), vals(b))
      assert(math.abs(r.getDouble(4) - want) < 5e-7, s"ks($a,$b): ${r.getDouble(4)} vs $want")
      val crit = 1.358 * math.sqrt((vals(a).length + vals(b).length).toDouble /
        (vals(a).length.toLong * vals(b).length))
      assert(math.abs(r.getDouble(5) - crit) < 5e-7)
      assert(r.getBoolean(6) == (r.getDouble(4) > r.getDouble(5)))
    }
  }

  test("driftIncrQ: JS of the delta shard against the index distribution matches a driver replay") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter("lang = 'en'").select("text").collect()
      .flatMap(r => wsToks(r.getString(0)))
      .groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val delta = docs.filter("lang = 'en' and doc_id % 20 = 0").select("text").collect()
      .flatMap(r => wsToks(r.getString(0)))
      .groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val (np, nq) = (base.values.sum.toDouble, delta.values.sum.toDouble)
    def h(m: Map[String, Double]): Double =
      -m.values.filter(_ > 0).map(p => p * math.log(p)).sum
    val pa = base.map { case (t, c) => t -> c / np }
    val pb = delta.map { case (t, c) => t -> c / nq }
    val mix = (pa.keySet ++ pb.keySet).map(t =>
      t -> (pa.getOrElse(t, 0.0) + pb.getOrElse(t, 0.0)) / 2).toMap
    val want = h(mix) - (h(pa) + h(pb)) / 2
    val r = graft.ops.LmIndex.driftIncrQ(spark, sf).head
    assert(r.getLong(0) == np.toLong && r.getLong(1) == nq.toLong)
    assert(r.getLong(2) == base.size.toLong && r.getLong(3) == delta.size.toLong)
    assert(r.getLong(4) == (base.keySet & delta.keySet).size.toLong)
    assert(math.abs(r.getDouble(5) - want) < 5e-7, s"js ${r.getDouble(5)} vs $want")
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= math.log(2.0) + 1e-9)
    PipelineCaches.release(spark)
  }

  test("hardNegativesIvfQ equals the brute miner restricted to same-cell candidates") {
    val emb = Tables.embeddings(spark, sf)
    val vecs = emb.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), r.getInt(2).toLong, v, math.sqrt(v.map(x => x * x).sum))
    }.filter(_._4 > 0)
    def cos(a: Array[Double], an: Double, b: Array[Double], bn: Double) =
      a.zip(b).map(p => p._1 * p._2).sum / (an * bn)
    // driver-side cell assignment: centroids are vec_id in [20, 36),
    // argmax sim with ties to the smaller cell
    val cents = vecs.filter(v => v._1 >= 20 && v._1 < 36)
    val cellOf = vecs.map { case (id, _, v, n) =>
      id -> cents.map(c => (c._1, cos(v, n, c._3, c._4)))
        .maxBy { case (cid, s) => (s, -cid) }._1
    }.toMap
    val got = SimSearch.hardNegativesIvfQ(emb).collect()
    got.foreach { r =>
      assert(cellOf(r.getLong(0)) == cellOf(r.getLong(2)),
        s"pair (${r.getLong(0)}, ${r.getLong(2)}) must share a cell")
      assert(r.getLong(1) != r.getLong(3), "label must differ")
    }
    // per anchor: the engine's list IS the brute top-k over same-cell
    // different-label candidates
    got.groupBy(_.getLong(0)).foreach { case (aid, rows) =>
      val (_, alab, av, an) = vecs.find(_._1 == aid).get
      val want = vecs
        .filter(v => v._1 != aid && v._2 != alab && cellOf(v._1) == cellOf(aid))
        .map(v => (v._1, cos(v._3, v._4, av, an)))
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      assert(rows.sortBy(_.getLong(5)).map(_.getLong(2)).toSeq == want.toSeq,
        s"anchor $aid blocked top-k")
    }
    PipelineCaches.release(spark)
  }

  test("hardNegativesQ: dense per-anchor ranks, label always differs, top-1 is the true max") {
    val emb = Tables.embeddings(spark, sf)
    val vecs = emb.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), r.getInt(2).toLong, v, math.sqrt(v.map(x => x * x).sum))
    }.filter(_._4 > 0)
    val got = SimSearch.hardNegativesQ(emb).collect()
    val byAnchor = got.groupBy(_.getLong(0))
    byAnchor.foreach { case (aid, rows) =>
      val ranks = rows.map(_.getLong(5)).sorted
      assert(ranks.sameElements(1L to rows.length.toLong), s"dense ranks for $aid")
      rows.foreach(r => assert(r.getLong(1) != r.getLong(3),
        s"label must differ (anchor $aid, neg ${r.getLong(2)})"))
      // rank-1 matches the driver-side argmax over different-label vectors
      val (_, alab, av, an) = vecs.find(_._1 == aid).get
      val best = vecs.filter(v => v._1 != aid && v._2 != alab)
        .map(v => (v._1, v._3.zip(av).map(p => p._1 * p._2).sum / (v._4 * an)))
        .maxBy { case (id, cos) => (cos, -id) }
      val top = rows.minBy(_.getLong(5))
      assert(top.getLong(2) == best._1, s"top-1 for anchor $aid")
      assert(math.abs(top.getDouble(4) - best._2) < 1e-9)
    }
    assert(byAnchor.keySet == vecs.filter(_._1 < 20).map(_._1).toSet)
  }
}
