package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Laws for the vocabulary-coverage and embedding-normalization
  * operators, checked against driver-side references on the real
  * sf0.001 tables. */
class VocabEmbedSpec extends SparkSuite {

  test("vocab matches a driver-side token count; coverage is monotone to ≤ 1") {
    val docs = Tables.documents(spark, sf)
    val counts = docs.collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val total = counts.values.sum.toDouble
    val want = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(50)
    val got = TextOps.vocabQ(docs, k = 50).orderBy("rank").collect()
    assert(got.length == math.min(50, counts.size),
      s"expected min(k, vocab)=${math.min(50, counts.size)} rows")
    var cum = 0L
    got.zip(want).zipWithIndex.foreach { case ((r, (tok, n)), i) =>
      assert(r.getLong(0) == i + 1, "rank is dense")
      assert(r.getString(1) == tok && r.getLong(2) == n, s"rank ${i + 1}")
      cum += n
      assert(math.abs(r.getDouble(3) - cum / total) < 1e-6, s"coverage at ${i + 1}")
    }
    val shares = got.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b }, "monotone")
    assert(shares.last <= 1.0 + 1e-9)
    PipelineCaches.release(spark)
  }

  test("vocab plan: top-k via TakeOrdered, window only above the k-row frame") {
    val plan = TextOps.vocabQ(Tables.documents(spark, sf), k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    PipelineCaches.release(spark)
  }

  test("entropyQ matches a driver-side Shannon entropy; normalized form in [0, 1]") {
    val docs = Tables.documents(spark, sf)
    val want = docs.select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
      .groupBy(identity).map { case ((s, t), g) => (s, t) -> g.length.toLong }
      .groupBy(_._1._1).map { case (s, m) =>
        val counts = m.values.map(_.toDouble)
        val n = counts.sum
        val h = counts.map(c => -(c / n) * math.log(c / n)).sum
        s -> (n.toLong, m.size.toLong, h)
      }
    val got = TextOps.entropyQ(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (s, (n, nd, h)) =>
      val (gn, gnd, gh, gnorm) = got(s)
      assert(gn == n && gnd == nd, s"source $s counts")
      assert(math.abs(gh - h) < 1e-5, s"source $s entropy $gh vs $h")
      assert(gnorm >= 0.0 && gnorm <= 1.0 + 1e-9, s"source $s norm")
      if (nd > 1) assert(math.abs(gnorm - h / math.log(nd.toDouble)) < 1e-5)
    }
  }

  test("sourceOverlap matches driver-side pairwise jaccard; pairs emitted once") {
    val docs = Tables.documents(spark, sf)
    val sets = docs.select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
      .distinct.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val slices = sets.keys.toSeq.sorted
    val want = (for {
      a <- slices; b <- slices if a < b
      common = (sets(a) & sets(b)).size if common > 0
    } yield (a, b) -> (common.toLong,
      common.toDouble / (sets(a).size + sets(b).size - common))).toMap
    val gotMap = TextOps.sourceOverlapQ(docs).collect()
      .map(r => (r.getAs[String]("slice_a"), r.getAs[String]("slice_b")) ->
        (r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))).toMap
    assert(gotMap.keySet == want.keySet)
    gotMap.foreach { case (k, (n, j)) =>
      assert(n == want(k)._1, s"pair $k common")
      assert(math.abs(j - want(k)._2) < 1e-5, s"pair $k jaccard")
      assert(k._1 < k._2, s"pair $k not canonical order")
    }
    PipelineCaches.release(spark)
  }

  test("pmi matches a driver-side reference on the top-k cut") {
    val (k, minCount) = (50, 5)
    val docs = Tables.documents(spark, sf)
    val tokenized = docs.select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val uni = tokenized.flatten.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val bi = tokenized.filter(_.length >= 2)
      .flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    val (nTot, bTot) = (uni.values.sum.toDouble, bi.values.sum.toDouble)
    val want = bi.filter(_._2 >= minCount).map { case ((a, b), nab) =>
      val pmi = math.log((nab / bTot) / ((uni(a) / nTot) * (uni(b) / nTot)))
      (a, b) -> (nab, BigDecimal(pmi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy { case ((a, b), (_, p)) => (-p, a, b) }.take(k)
    val got = TextOps.pmiQ(docs, k, minCount).collect()
      .map(r => ((r.getAs[String]("tok_a"), r.getAs[String]("tok_b")),
        (r.getAs[Long]("n_ab"), r.getAs[Double]("pmi"))))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
    PipelineCaches.release(spark)
  }

  test("embedNorm: norm and checksum reconstruct the raw sums; map-side only") {
    val emb = Tables.embeddings(spark, sf)
    val df = SimSearch.embedNormQ(emb)
    val got = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val raw = emb.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      r.getLong(0) -> v
    }.toMap
    assert(got.keySet == raw.keySet)
    raw.foreach { case (id, v) =>
      val (dims, norm, unitSum) = got(id)
      assert(dims == v.length)
      val trueNorm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - trueNorm) < 1e-5, s"vec $id norm")
      val trueUnit = if (trueNorm == 0) v.sum else v.map(_ / trueNorm).sum
      assert(math.abs(unitSum - trueUnit) < 1e-5, s"vec $id unit sum")
    }
    // pure map-side: no exchange anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("randomProject: driver replay, JL distance law, sparse matrix, map-side plan") {
    val emb = Tables.embeddings(spark, sf)
    val df = SimSearch.randomProjectQ(emb)
    // map-side only, and the matrix is baked into codegen (no per-row
    // md5: the expression tree carries element_at refs, not hash calls)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(600))
    assert(!plan.toLowerCase.contains("md5"), "matrix must be driver-materialized")
    import SimSearch.RandomProject._
    // matrix density ≈ 1/3 per output dim (binomial(64, 1/3) bounds)
    (0 until OutDims).foreach { j =>
      val nz = terms(j).size
      assert(nz >= 10 && nz <= 36, s"out-dim $j has $nz nonzeros of $Dims")
    }
    val rows = df.collect().map(r =>
      r.getLong(0) -> (0 until OutDims).map(j => r.getDouble(j + 1)).toArray).toMap
    val raw = emb.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap
    assert(rows.keySet == raw.keySet)
    // driver replay: same matrix, same order of adds, same rounding
    raw.foreach { case (id, v) =>
      (0 until OutDims).foreach { j =>
        val s = terms(j).foldLeft(0.0) { case (acc, (i, sg)) =>
          if (sg > 0) acc + v(i) else acc - v(i)
        }
        val want = BigDecimal(s * Scale)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(math.abs(rows(id)(j) - want) < 1e-9, s"vec $id dim $j")
      }
    }
    // JL law on the fixture: squared distances survive the 64→16 cut
    // within a generous band for the bulk of sampled pairs
    val ids = raw.keys.toSeq.sorted.take(25)
    val ratios = for {
      a <- ids; b <- ids if a < b
      d0 = raw(a).zip(raw(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      if d0 > 1e-12
      d1 = rows(a).zip(rows(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    } yield d1 / d0
    val inBand = ratios.count(r => r > 0.35 && r < 2.8)
    assert(inBand.toDouble / ratios.size >= 0.8,
      s"only $inBand/${ratios.size} pair distances inside the JL band")
  }
}
