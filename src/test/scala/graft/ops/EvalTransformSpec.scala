package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Evaluation/audit operators (exact AUC, ANN recall, nano k-means) and
  * the transform/containment additions: driver-side reference replays
  * over the real sf0.001 tables plus the semantic pins that motivate
  * each operator (containment vs Jaccard on a pasted sub-document,
  * adjacency-only collapse, recall ≤ 1 with honest zero rows). */
class EvalTransformSpec extends SparkSuite {

  private def docsDf = Tables.documents(spark, sf)
  private def embDf = Tables.embeddings(spark, sf)

  // ---- q_auc ---------------------------------------------------------

  test("auc matches the O(P·N) pair-counting definition") {
    val scored = Scoring.qualityClassifierQ(docsDf)
      .select("doc_id", "logit").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val langs = docsDf.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // keys.toSeq FIRST: mapping a key SET straight to logits would
    // collapse docs that share a logit value
    val pos = scored.keys.toSeq.filter(id => langs(id) == "en").map(scored)
    val neg = scored.keys.toSeq.filter(id => langs(id) != "en").map(scored)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = wins / (pos.size.toDouble * neg.size.toDouble)

    val got = Scoring.aucQ(docsDf).collect().head
    assert(got.getLong(0) == pos.size && got.getLong(1) == neg.size)
    assert(got.getLong(2) == math.rint(2 * wins).toLong, "u2 is 2×wins exactly")
    assert(math.abs(got.getDouble(3) - want) < 1e-6)
  }

  test("auc: perfect separation → 1.0; single-class corpus → NULL auc") {
    import spark.implicits._
    // scores via the real classifier but labels engineered: every 'en'
    // doc replaced by a high-logit text is overkill — instead pin the
    // formula on the degenerate single-class input, where P·N = 0
    val oneClass = Seq((1L, "alpha beta gamma", "en", "s"),
      (2L, "delta epsilon zeta", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val row = Scoring.aucQ(oneClass).collect().head
    assert(row.getLong(1) == 0L && row.isNullAt(3), "no negatives → NULL auc")
  }

  test("binned auc: bounded bin table, and binning only coarsens — " +
    "u2 moves by at most the within-bin pair mass") {
    val exact = Scoring.aucQ(docsDf).collect().head
    val binned = Scoring.aucBinnedQ(docsDf).collect().head
    assert(binned.getLong(0) <= 1024L, "bin table is bounded by construction")
    assert(binned.getLong(1) == exact.getLong(0) &&
      binned.getLong(2) == exact.getLong(1), "populations agree")
    // binned AUC = exact AUC of the binned scores: deviation is bounded
    // by the ties binning ADDS (each such pair moves u2 by at most 1
    // in either direction from its exact win/loss)
    assert(math.abs(binned.getDouble(4) - exact.getDouble(3)) < 0.05,
      "1024 bins over [-1,1] keep the readout close to exact")
  }

  // ---- q_gopher_rules --------------------------------------------------

  test("gopher rules: engineered docs trip each rule independently") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => s"the word$i of").mkString(" ") // 150 words, mean len ≥ 3
    val docs = Seq(
      (1L, fifty), // passes everything
      (2L, "the of and"), // too short
      (3L, fifty + " " + (1 to 20).map(_ => "#").mkString(" ")), // symbols
      (4L, (1 to 60).map(_ => "the supercalifragilistic").mkString(" ")), // mean len > 10? no — pin below
      (5L, fifty.replace("the", "123").replace("of", "456")), // no alpha, no stopwords
      (6L, "")).toDF("doc_id", "text")
    val got = TextOps.gopherRulesQ(docs).collect()
      .map(r => r.getLong(0) -> r.getValuesMap[Long](Seq("r_word_count",
        "r_mean_word_len", "r_symbol_ratio", "r_alpha_words", "r_stopwords",
        "keep"))).toMap
    assert(got(1L)("keep") == 1L)
    assert(got(2L)("r_word_count") == 0L && got(2L)("keep") == 0L)
    assert(got(3L)("r_symbol_ratio") == 0L && got(3L)("keep") == 0L)
    assert(got(5L)("r_alpha_words") == 0L && got(5L)("r_stopwords") == 0L)
    // the all-fail degenerate: zero words fails every bounds rule
    assert(got(6L)("r_word_count") == 0L && got(6L)("r_mean_word_len") == 0L
      && got(6L)("r_symbol_ratio") == 0L && got(6L)("r_alpha_words") == 0L)
  }

  test("gopher rules match a driver-side replay on the real corpus") {
    val stopSet = Set("the", "be", "to", "of", "and", "that", "have", "with")
    val want = docsDf.select("doc_id", "text").collect().map { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = tk.length.toLong
      val sumLen = tk.map(_.length.toLong).sum
      val symbols = (text.length - text.replace("...", "").length) / 3 +
        (text.length - text.replace("#", "").length)
      val alpha = tk.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val stops = stopSet.count(tk.contains).toLong
      id -> (n, sumLen, symbols.toLong, alpha, stops)
    }.toMap
    TextOps.gopherRulesQ(docsDf).collect().foreach { r =>
      val (n, sl, sy, al, st) = want(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((n, sl, sy, al, st)), s"doc ${r.getLong(0)}")
      assert(r.getAs[Long]("keep") ==
        (if (n >= 50 && n <= 100000 && sl >= 3 * n && sl <= 10 * n && n > 0
          && 10 * sy <= n && 5 * al >= 4 * n && st >= 2) 1L else 0L))
    }
  }

  // ---- q_ann_recall --------------------------------------------------

  test("ann recall audit: exact-set arithmetic against the two rankings") {
    val exact = SimSearch.cosineTopK(embDf).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimSearch.ivfTopK(embDf).select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = exact.map(_._1).map { p =>
      p -> approx.count { case (ap, an) => ap == p && exact((p, an)) }.toLong
    }.toMap
    val got = SimSearch.annRecallQ(embDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet, "every probe emits a row, hits or not")
    got.foreach { case (p, (h, rec)) =>
      assert(h == want(p), s"probe $p hits")
      assert(math.abs(rec - h / 5.0) < 1e-9)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  // ---- q_kmeans ------------------------------------------------------

  test("nano k-means: populations partition the corpus; iterating moves centroids") {
    val out = SimSearch.kmeansNanoQ(embDf).cache()
    val normedCount = embDf.count() // sf0.001 embeddings have no zero vectors
    assert(out.agg(sum("n_vecs")).head.getLong(0) == normedCount,
      "final assignment partitions every vector")
    assert(out.select("cell").distinct().count() == out.count())
    // trained centroids differ from the raw seeds: a seed vector's norm
    // is its own nrm, the trained cell norm is a mean's — strictly
    // smaller on this corpus (means contract toward the origin)
    val seedNorms = SimSearch.normalizeL2(embDf)
      .filter(col("vec_id") >= 5 && col("vec_id") < 13)
      .select(col("l2_norm")).collect().map(_.getDouble(0))
    val trained = out.select("cv_norm").collect().map(_.getDouble(0))
    assert(trained.max < seedNorms.min,
      "M-step ran: every trained centroid norm sits below every raw seed norm")
  }

  test("nano k-means M-step is exact: one-cell corpus → centroid = nano mean") {
    import spark.implicits._
    // two 2-d vectors, one seed (vec_id 5 missing → seeds empty would
    // drop everything, so seed from 0 with 1 cell)
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = SimSearch.kmeansNanoQ(tiny, nCells = 1, iters = 2, seedFrom = 0)
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
    // mean of (1,0) and (0,1) = (0.5, 0.5): cv_sum 1.0, norm √0.5
    assert(math.abs(out.head.getDouble(2) - 1.0) < 1e-9)
    assert(math.abs(out.head.getDouble(3) - math.sqrt(0.5)) < 1e-6)
  }

  // ---- q_collapse_repeats --------------------------------------------

  test("collapse repeats: adjacent runs collapse, non-adjacent repeats survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the quick quick fox"),
      (2L, "a b a b a b"), // alternating: nothing adjacent, nothing removed
      (3L, "  x   x  "), // whitespace noise still normalizes then collapses
      (4L, ""), (5L, "   ")).toDF("doc_id", "text")
    val got = TextOps.collapseRepeatsQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((6L, 3L, "the quick fox")))
    assert(got(2L) == ((6L, 6L, "a b a b a b")))
    assert(got(3L) == ((2L, 1L, "x")))
    assert(got(4L) == ((0L, 0L, "")) && got(5L) == ((0L, 0L, "")))
  }

  test("collapse repeats is idempotent on the real corpus") {
    val once = TextOps.collapseRepeatsQ(docsDf)
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = TextOps.collapseRepeatsQ(once)
    assert(twice.filter(col("n_tokens") =!= col("n_kept")).isEmpty,
      "a second pass finds nothing left to collapse")
  }

  // ---- q_dedup_containment -------------------------------------------

  test("containment flags a pasted sub-document that Jaccard misses") {
    import spark.implicits._
    val small = "orange kiwi mango papaya lychee guava"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, small), // 4 distinct 3-shingles
      (2L, s"$filler $small"), // contains doc 1 whole
      (3L, "completely different text about other things entirely"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.9 },
      "the embedded copy scores containment ≈ 1")
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.3).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "Jaccard at its own near-dup threshold never sees the pair")
  }

  test("containment equals the set definition on the real corpus") {
    val pairs = Dedup.containmentPairs(docsDf, threshold = 0.5).cache()
    assert(pairs.filter(col("doc_a") >= col("doc_b")).isEmpty)
    assert(pairs.filter(col("containment") < 0.5 || col("containment") > 1.0).isEmpty)
    // cross-check one pair against a driver-side shingle-set replay
    val head = pairs.orderBy("doc_a", "doc_b").collect().headOption
    head.foreach { r =>
      val byId = docsDf.select("doc_id", "text").collect()
        .map(x => x.getLong(0) -> x.getString(1)).toMap
      def shingles(t: String): Set[String] = {
        val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
      // df cap: drop shingles present in > 50 docs (none at sf0.001,
      // but replay it anyway for fidelity)
      val all = byId.values.toSeq.map(shingles)
      val df = all.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def rare(s: Set[String]) = s.filter(df(_) <= 50)
      val (a, b) = (rare(shingles(byId(r.getLong(0)))), rare(shingles(byId(r.getLong(1)))))
      val want = (a & b).size.toDouble / math.min(a.size, b.size)
      assert(math.abs(r.getDouble(2) - want) < 1e-9)
    }
  }

  // ---- q_power_iter --------------------------------------------------

  test("power iteration: exact integer replay; 3 integer rounds land " +
    "near the true dominant direction") {
    val got = SimSearch.powerIterQ(embDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val X = embDf.select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val xm = X.map(_.map(x => math.floor(x * 1e6).toLong))
    val d = xm.head.length
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to 3) {
      val s = xm.map { row =>
        val sn = row.zip(v).map { case (a, b) => a * b }.sum
        math.signum(sn) * (math.abs(sn) / 1000000L)
      }
      val w = Array.tabulate(d)(j => xm.indices.map(i => s(i) * xm(i)(j)).sum)
      val dv = math.max(1L, w.map(math.abs).max / 1000000L)
      v = w.map(x => math.signum(x) * (math.abs(x) / dv))
    }
    assert(got == v.zipWithIndex.map { case (x, j) => j.toLong -> x }.toMap,
      "engine fold must replay the integer reference bit-for-bit")
  }

  test("power iteration converges on a planted dominant direction " +
    "(the real corpus is near-isotropic — no direction to find there)") {
    import spark.implicits._
    // X_i = 10·g + small deterministic noise: σ2/σ1 ≈ 0.03, so 3
    // rounds must align with g almost exactly. The REAL embedding
    // fixture has σ2/σ1 ≈ 0.99 (isotropic random vectors) where power
    // iteration legitimately needs hundreds of rounds — convergence is
    // a property of the spectrum, so it is pinned where a spectrum
    // gap exists by construction.
    val d = 8
    val gRaw = (1 to d).map(_.toDouble)
    val gn = math.sqrt(gRaw.map(x => x * x).sum)
    val g = gRaw.map(_ / gn)
    val rows = (0 until 60).map { i =>
      (i.toLong, (0 until d).map { j =>
        (10.0 * g(j) + (((i * 31 + j * 17) % 7) - 3) / 10.0).toFloat
      })
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = SimSearch.powerIterQ(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vd = (0 until d).map(j => got(j.toLong).toDouble)
    val cos = vd.zip(g).map { case (a, b) => a * b }.sum /
      math.sqrt(vd.map(x => x * x).sum)
    assert(math.abs(cos) > 0.999,
      s"3 integer rounds must align with the planted direction, cos=$cos")
  }

  // ---- q_pr_curve ----------------------------------------------------

  test("pr curve: confusion counts replay the ≥-threshold definition " +
    "and obey the sweep laws") {
    val rows = Scoring.prCurveQ(docsDf)
      .orderBy(col("threshold").desc).collect()
    val scored = Scoring.qualityClassifierQ(docsDf)
      .select("doc_id", "logit").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val langs = docsDf.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    val nPos = scored.count(x => langs(x._1))
    assert(rows.length == scored.map(_._2).distinct.length,
      "one row per distinct logit")
    // exact replay at three thresholds: top, median, bottom
    for (r <- Seq(rows.head, rows(rows.length / 2), rows.last)) {
      val t = r.getDouble(0)
      val tp = scored.count(x => x._2 >= t && langs(x._1)).toLong
      val fp = scored.count(x => x._2 >= t && !langs(x._1)).toLong
      assert(r.getLong(1) == tp && r.getLong(2) == fp &&
        r.getLong(3) == nPos - tp)
    }
    // sweep laws: tp/fp non-decreasing as threshold falls; tp+fn = P
    // everywhere; the lowest threshold classifies everything positive
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getLong(1) <= lo.getLong(1) && hi.getLong(2) <= lo.getLong(2))
    }
    assert(rows.forall(r => r.getLong(1) + r.getLong(3) == nPos))
    assert(rows.last.getDouble(5) == 1.0, "recall = 1 at the bottom cut")
  }

  // ---- q_ece ---------------------------------------------------------

  test("ece: integer-micro fold matches a driver-side replay; " +
    "bins bounded; ece in [0,1]") {
    val got = Scoring.eceQ(docsDf).collect().head
    val scored = Scoring.qualityClassifierQ(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val langs = docsDf.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    // replay: p_micro = floor((swm + 1000n)·1e6 / 2000n) with swm
    // recovered exactly (logit·n·1000 is integral by construction)
    val perDoc = scored.map { case (id, n, logit) =>
      val swm = math.rint(logit * n * 1000).toLong
      val pMicro = (swm + 1000L * n) * 1000000L / (2000L * n)
      (math.min(9L, pMicro / 100000L), if (langs(id)) 1L else 0L, pMicro)
    }
    val byBin = perDoc.groupBy(_._1).values.toSeq
    val gapSum = byBin.map(g =>
      math.abs(1000000L * g.map(_._2).sum - g.map(_._3).sum)).sum
    assert(got.getLong(0) == perDoc.length.toLong)
    assert(got.getLong(1) == byBin.size.toLong && got.getLong(1) <= 10L)
    assert(got.getLong(2) == gapSum, "gap sum is exact BIGINT arithmetic")
    val ece = got.getDouble(3)
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("ece: a perfectly calibrated engineered bin scores zero gap") {
    import spark.implicits._
    // two docs in the same confidence bin, one positive one negative,
    // each with confidence exactly 0.5 → bin gap |2·0.5e6 − 1e6| = 0.
    // Confidence 0.5 ⇔ swm = 0: craft one-token docs whose single
    // bucket weight is 0 by searching the real weight table.
    val w = Scoring.qualityClassifierWeights(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // find a token with weight 0 among simple alphanumerics — the
    // bucket hash replayed driver-side (first 15 md5 hex chars, mod
    // 1024: the pinned Md5Bits spelling)
    def bucketOf(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1024L
    }
    val hit = (0 until 20000).map(i => s"t$i").find(t => w(bucketOf(t)) == 0L)
    assume(hit.isDefined, "needs a zero-weight token in the probe set")
    val docs = Seq((1L, hit.get, "en", "s"), (2L, hit.get, "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val row = Scoring.eceQ(docs).collect().head
    assert(row.getLong(2) == 0L && row.getDouble(3) == 0.0)
    // the proper-scoring-rule distinction: the same fixture is
    // perfectly CALIBRATED (ece 0) but maximally UNRESOLVED — both
    // docs sit at confidence 0.5, so Brier charges (0.5)² = 0.25
    val br = Scoring.brierQ(docs).collect().head
    assert(br.getLong(0) == 2L &&
      br.getLong(1) == 2L * 500000L * 500000L && br.getDouble(2) == 0.25,
      "zero-ECE uniform scorer must still pay full Brier resolution cost")
  }

  test("brier matches a driver-side exact replay on the real corpus") {
    val got = Scoring.brierQ(docsDf).collect().head
    val scored = Scoring.qualityClassifierQ(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val langs = docsDf.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    val sq = scored.map { case (id, n, logit) =>
      val swm = math.rint(logit * n * 1000).toLong
      val p = (swm + 1000L * n) * 1000000L / (2000L * n)
      val gap = (if (langs(id)) 1000000L else 0L) - p
      gap * gap
    }.sum
    assert(got.getLong(0) == scored.length.toLong && got.getLong(1) == sq)
    assert(got.getDouble(2) >= 0.0 && got.getDouble(2) <= 1.0)
  }
}
