package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws for the round-11 weighted draw + embedding outlier ops: exact
  * driver replays (the same IEEE arithmetic re-run on the driver must
  * reproduce every selection and flag), the weighted sampler's quota
  * and layout-independence, and a hand-built outlier fixture pinning
  * the integer-nano margin semantics. */
class WeightedSampleOutlierSpec extends SparkSuite {

  test("sampleWeightedKQ: driver replay reproduces the exact selection; quotas; plan") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val k = 10
    val got = Sampling.sampleWeightedKQ(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // driver replay: same hash uniform, same ln, same round-6 key
    val base = docs.filter(col("source").isNotNull && col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        conv(substring(md5(concat(lit("ws:"), col("doc_id").cast("string"))),
          1, 11), 16, 10).cast("long").as("h"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = base.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      val keyed = rows.map { case (_, id, w, h) =>
        val u = (h.toDouble + 0.5) / 17592186044416.0
        val key = BigDecimal(math.log(u) / w.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, key)
      }
      keyed.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._2, b._2)
        c > 0 || (c == 0 && a._1 < b._1)
      }.take(k).zipWithIndex.map { case ((id, key), i) =>
        (src, (i + 1).toLong, id, key + 0.0)
      }
    }.toSet
    assert(got == want)
    // quota: exactly min(k, |stratum|) per source
    val perSrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    val counts = base.groupBy(_._1).view.mapValues(_.size).toMap
    counts.foreach { case (src, n) =>
      assert(perSrc.getOrElse(src, 0) == math.min(k, n))
    }
    // the draw is length-biased: the selected rows' mean length beats
    // the corpus mean (deterministic on the fixed fixture)
    val lenOf = base.map(b => b._2 -> b._3).toMap
    val selMean = got.toSeq.map(g => lenOf(g._3)).sum.toDouble / got.size
    val allMean = base.map(_._3).sum.toDouble / base.length
    assert(selMean > allMean,
      f"weighted draw must skew long: sel=$selMean%.0f all=$allMean%.0f")
    // layout-independence + scale shape
    val re = Sampling.sampleWeightedKQ(
      docs.repartition(7, col("doc_id")), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(re == got)
    val plan = Sampling.sampleWeightedKQ(docs, k)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number") && plan.contains("ObjectHashAggregate"),
      plan.take(600))
  }

  test("embedOutliers: driver replay reproduces every flag on the fixture") {
    val rows = graft.sources.Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val nn = rows.filter { case (_, v) => dot(v, v) > 0 }
      .map { case (id, v) => (id, v, math.sqrt(dot(v, v))) }
    val cents = nn.filter(c => c._1 >= 5 && c._1 < 21)
    val best = nn.map { case (id, v, nrm) =>
      val (cell, sim) = cents.map { case (c, cv, cn) =>
        (c, dot(v, cv) / (nrm * cn))
      }.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._2, b._2)
        c > 0 || (c == 0 && a._1 < b._1)
      }.head
      // HALF_UP away from zero — Spark round()'s BigDecimal discipline
      // (math.round is half-toward-+inf, wrong for negative sims)
      (id, cell,
        BigDecimal(sim * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val stats = best.groupBy(_._2).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._3).sum)).toMap
    val want = best.map { case (id, cell, simN) =>
      val (n, tot) = stats(cell)
      (id, cell, simN, simN * n < tot - 50000000L * n)
    }.toSet
    val got = SimSearch.embedOutlierQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == want)
    assert(got.nonEmpty && got.exists(_._4) && got.exists(!_._4),
      "fixture must exercise both flag values")
  }

  test("corpusReportQ: totals tie to the corpus; cross-source dup counted in both sources") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = TextOps.corpusReportQ(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out.values.map(_._1).sum == docs.count(), "every doc in exactly one source row")
    val chars = docs.agg(sum(length(col("text")))).head.getLong(0)
    assert(out.values.map(_._2).sum == chars)
    // synthetic: the same text hosted by two sources -> n_exact_dup = 1
    // in BOTH rows (corpus-wide dup semantics), unique docs count 0
    val syn = Seq(
      (1L, "shared body", "en", "siteA", 11L),
      (2L, "shared body", "en", "siteB", 11L),
      (3L, "unique body", "en", "siteA", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = TextOps.corpusReportQ(syn).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(rep == Map("siteA" -> 1L, "siteB" -> 1L))
  }

  test("embedOutliers: hand fixture pins the integer-nano margin semantics") {
    import spark.implicits._
    // one centroid (vec_id 5); three aligned vectors and one at cos 0.9.
    // sims {1, 1, 1, 0.9}: mean 0.975, margin 0.05 -> only 0.9 flags
    // (0.9e9*4 = 3.6e9 < 3.9e9 - 0.2e9 = 3.7e9)
    val off = Array(0.9f, math.sqrt(1.0 - 0.81).toFloat)
    val emb = Seq(
      (5L, Array(1.0f, 0.0f)),
      (100L, Array(2.0f, 0.0f)),
      (101L, Array(0.5f, 0.0f)),
      (102L, off)
    ).toDF("vec_id", "embedding")
    val got = SimSearch.embedOutliers(emb).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(5L -> false, 100L -> false, 101L -> false, 102L -> true))
  }

  test("densitySample: flattens cell densities, small cells survive whole, draw replays") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val df = SimSearch.densitySample(emb, target = 2)
    val plan = df.queryExecution.executedPlan.toString
    // size table joins back as a broadcast (16 rows) — a sort-merge
    // join here would shuffle the corpus a second time
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    val kept = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.ops.PipelineCaches.release(spark)
    // cells at or under target keep everything (cut = 1e6 admits all)
    kept.filter(_._3 <= 2).groupBy(_._2).foreach { case (cell, rs) =>
      assert(rs.length.toLong == rs.head._3, s"cell $cell dropped from a sparse cell")
      assert(rs.head._4 == 1000000L)
    }
    // every kept row replays the draw on the driver
    kept.foreach { case (id, _, _, cut) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ds:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      assert(java.lang.Long.parseLong(hex, 16) % 1000000L < cut, s"vec $id draw")
    }
    // dense cells were actually cut: at least one cell has fewer kept
    // rows than members (the sf0.001 corpus is 50 vecs over ≤16 cells)
    val keptPerCell = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(kept.exists { case (_, cell, n, _) => keptPerCell(cell) < n },
      s"no dense cell was downsampled: $keptPerCell")
  }

  test("domainCapQ: cap + volume in one aggregate, best-first, no rank window") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val q = Sampling.domainCapQ(docs, k = 3)
    // the whole query is ONE domain-key aggregate: bounded-buffer top-k
    // rides ObjectHashAggregate, no row_number window, and exactly one
    // exchange (the domain shuffle) — the shape that caps a hot domain
    // without ever sorting its full row set
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      plan.take(600))
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(600))
    val rows = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per domain: exactly min(k, n_docs) survivors, ranks 1..that
    rows.groupBy(_._1).foreach { case (dom, rs) =>
      val n = rs.head._2
      assert(rs.length == math.min(3L, n), s"$dom kept ${rs.length} of $n")
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
      // best-first: ranks descend by n_chars with doc_id tie-break
      val ordered = rs.sortBy(_._3).map(r => (r._5, r._4)).toSeq
      assert(ordered.sliding(2).forall {
        case Seq((c1, id1), (c2, id2)) => c1 > c2 || (c1 == c2 && id1 < id2)
        case _ => true
      }, s"$dom not best-first: $ordered")
      // nothing outside the cap beats anyone inside it
      val kept = rs.map(_._4).toSet
      val floor = ordered.last
      val beaten = docs.filter(
          lower(concat(col("source"), org.apache.spark.sql.functions.lit(".example.com"))) === dom &&
          !col("doc_id").isInCollection(kept))
        .select(col("n_chars"), col("doc_id")).collect()
        .filter(r => r.getLong(0) > floor._1 ||
          (r.getLong(0) == floor._1 && r.getLong(1) < floor._2))
      assert(beaten.isEmpty, s"$dom dropped better docs: ${beaten.mkString(",")}")
    }
  }
}
