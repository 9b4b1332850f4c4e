package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** LLM-pipeline operator invariants on sf0.001. */
class LlmOpsSpec extends SparkSuite {

  private def docsDf = spark.read.parquet(s"$sf/documents.parquet")
  private def embDf = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup partitions the corpus: dup counts sum to total docs") {
    val docs = docsDf
    val deduped = Dedup.exactDedup(docs).cache()
    assert(deduped.agg(sum("dup_cnt")).head.getLong(0) == docs.count())
    assert(deduped.select("doc_id").distinct().count() == deduped.count())
  }

  test("minhash signatures: identical token sets → identical signatures") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the  QUICK brown   fox"), // same tokens after normalization
      (3L, "something else entirely")).toDF("doc_id", "text")
    val sig = Dedup.signatures(Dedup.tokArrays(docs)).collect()
      .map(r => r.getLong(0) -> (1 until 9).map(r.getLong).mkString(",")).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("near-dup pairs: ordered, thresholded, jaccard ≤ 1") {
    val pairs = Dedup.nearDupPairs(docsDf).cache()
    assert(pairs.filter(col("doc_a") >= col("doc_b")).isEmpty)
    assert(pairs.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).isEmpty)
  }

  test("minhash estimator: eighths-valued, exact on identical docs, bounded mean error") {
    import spark.implicits._
    val est = Dedup.minhashEstQ(docsDf).cache()
    // estimates are exact multiples of 1/8 in [0, 1]
    assert(est.filter(col("est_jaccard") * 8 =!= (col("est_jaccard") * 8).cast("long"))
      .isEmpty)
    assert(est.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1).isEmpty)
    // an exact-duplicate pair estimates 1.0 with error 0: same token
    // set -> identical minima in every component
    val dup = Seq((9001L, "alpha beta gamma delta epsilon zeta"),
      (9002L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val d = Dedup.minhashEstQ(dup).collect()
    assert(d.length == 1 && d.head.getDouble(3) == 1.0 && d.head.getDouble(4) == 0.0)
    graft.ops.PipelineCaches.release(spark)
    // over the fixture's verified pairs (j >= 0.5) the 8-component
    // estimator's mean |error| stays well under its worst-case spread
    val meanErr = est.agg(avg(col("abs_err"))).head.getDouble(0)
    assert(meanErr < 0.3, s"mean |est - jaccard| = $meanErr")
    est.unpersist()
  }

  test("fingerprints: deterministic, one per doc") {
    val fp = Dedup.fingerprints(docsDf).cache()
    val docs = docsDf
    assert(fp.count() == docs.count())
    assert(fp.filter(col("fp").isNull).isEmpty)
  }

  test("cosine top-k: k rows per probe, sims in [-1,1], no self-match") {
    val got = SimSearch.cosineTopK(embDf, nProbes = 5, k = 5).cache()
    assert(got.count() == 25)
    assert(got.filter(col("probe_id") === col("neighbor_id")).isEmpty)
    assert(got.filter(abs(col("cos_sim")) > 1.0 + 1e-9).isEmpty)
    val perProbe = got.groupBy("probe_id").count().collect()
    assert(perProbe.forall(_.getLong(1) == 5))
  }

  test("sign-bucket LSH: subset semantics and bounded k") {
    val got = SimSearch.signBucketTopK(embDf, nProbes = 5, k = 5, bits = 2).cache()
    assert(got.count() > 0, "coarse buckets must yield candidates")
    assert(got.groupBy("probe_id").count().filter(col("count") > 5).isEmpty)
  }

  test("ivf top-k: recall vs brute force is monotone in probe cells and above floor") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(SimSearch.cosineTopK(embDf, nProbes = 5, k = 5))
    def recall(nProbeCells: Int): Double = {
      val got = pairs(SimSearch.ivfTopK(embDf, nProbes = 5, k = 5,
        nCells = 16, nProbeCells = nProbeCells))
      (got & brute).size.toDouble / brute.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    // superset of scanned cells ⇒ per-probe top-k can only move toward
    // the true top-k — the defining IVF accuracy/cost dial
    assert(r4 >= r1, s"recall must be monotone in nProbeCells: $r1 vs $r4")
    assert(r4 >= 0.2, s"recall@4-of-16-cells too low: $r4")
  }

  test("ivf k-means training: trained centroids' recall ≥ sampled centroids'") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(SimSearch.cosineTopK(embDf, nProbes = 5, k = 5))
    def recall(cents: org.apache.spark.sql.DataFrame): Double = {
      val got = pairs(SimSearch.ivfTopKWith(embDf, cents,
        nProbes = 5, k = 5, nProbeCells = 2))
      (got & brute).size.toDouble / brute.size
    }
    val sampled = recall(SimSearch.sampledCentroids(embDf, nCells = 16, from = 5))
    val trained = recall(SimSearch.trainIvfCentroids(embDf, nCells = 16, iters = 5))
    // Lloyd's moves centroids toward cluster means: cells get rounder,
    // so the fixed probe budget covers more of each probe's true
    // neighborhood — on this fixture training must not lose recall
    assert(trained >= sampled,
      s"k-means-trained centroids regressed recall: $trained < $sampled")
  }

  test("simhash: identical token sets → hamming 0; pairs ordered and thresholded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "THE  quick brown fox   JUMPS"), // same token set normalized
      (3L, "completely different words here altogether")).toDF("doc_id", "text")
    val fp = Dedup.simhashFingerprints(Dedup.tokens(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))

    val pairs = Dedup.simhashPairs(docsDf).cache()
    assert(pairs.filter(col("doc_a") >= col("doc_b")).isEmpty)
    assert(pairs.filter(col("hamming") > 3 || col("hamming") < 0).isEmpty)
  }

  test("ngram jaccard: bounded scores, ordered pairs, self-similarity = 1") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(docsDf).cache()
    assert(pairs.filter(col("doc_a") >= col("doc_b")).isEmpty)
    assert(pairs.filter(col("jaccard") < 0.3 || col("jaccard") > 1.0).isEmpty)
  }

  test("embedding near-dup: ordered pairs, cosine within [threshold, 1]") {
    val pairs = SimSearch.embedNearDup(embDf, bits = 2, threshold = 0.2).cache()
    assert(pairs.filter(col("vec_a") >= col("vec_b")).isEmpty)
    assert(pairs.filter(col("cos_sim") < 0.2 || col("cos_sim") > 1.0 + 1e-9).isEmpty)
  }

  test("embed near-dup auto: prefix-bucket recall ⊇ fixed 8-bit form; caps wrapped rotations") {
    // autoBits on this corpus gives < 8 bits, and a b-bit bucket is a
    // PREFIX of the 8-bit bucket — any pair agreeing on 8 sign bits
    // agrees on the first b, so the auto blocking can only ADD pairs
    // relative to the declared fixed form (and rotation 2 adds more).
    val n = embDf.count()
    val bitsAuto = SimSearch.autoBits(n)
    assert(bitsAuto < 8, s"fixture corpus ($n rows) should yield coarse buckets")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = keys(SimSearch.embedNearDup(embDf, bits = 8, threshold = 0.25))
    val auto = keys(SimSearch.embedNearDupAuto(embDf, threshold = 0.25))
    assert(fixed.subsetOf(auto),
      "auto (coarser prefix buckets + extra rotation) must never lose a fixed-form pair")
    // rotation cap: d=16-dim embeddings with bits=8 have exactly 2
    // distinct windows; asking for 4 rotations must equal asking for 2
    // (rotations 2,3 would wrap onto 0,1 — pure waste, same result)
    val dim = embDf.select(size(col("embedding"))).head.getInt(0)
    val maxRot = (dim + 7) / 8
    val r2 = keys(SimSearch.embedNearDup(embDf, bits = 8, threshold = 0.1, rotations = maxRot))
    val r4 = keys(SimSearch.embedNearDup(embDf, bits = 8, threshold = 0.1, rotations = maxRot + 2))
    assert(r2 == r4, "rotations past ceil(d/bits) must be capped, not re-run")
  }

  test("rotation cap is d/gcd(d,bits): bits ∤ d windows are kept, bits > d is safe") {
    import spark.implicits._
    // d=20, bits=8: windows start at 0,8,16,4,12 — five DISTINCT windows
    // (period d/gcd = 20/4 = 5), where a ceil(d/bits)=3 cap would stop
    // at rotation 2. This pair differs in sign only at dims 0 and 12,
    // which land in the windows of rotations 0 (0..7), 1 (8..15),
    // 2 (16..19,0..3) and 4 (12..19) — rotation 3 (4..11) is the ONLY
    // projection that buckets them together.
    val base = Array.fill(20)(1.0f)
    val flipped = base.clone(); flipped(0) = -0.1f; flipped(12) = -0.1f
    val emb20 = Seq((1L, base.toSeq), (2L, flipped.toSeq)).toDF("vec_id", "embedding")
    def found(rotations: Int): Boolean =
      SimSearch.embedNearDup(emb20, bits = 8, threshold = 0.25, rotations = rotations)
        .count() > 0
    assert(!found(3), "rotations 0-2 must all miss the pair (fixture sanity)")
    assert(found(5),
      "rotation 3 is a genuinely distinct window when bits does not divide d — " +
        "a ceil(d/bits) cap would silently discard it")
    // bits wider than the embedding dim must wrap (duplicate chars), not
    // throw ANSI ArrayIndexOutOfBounds — the autoBits-outgrows-narrow-
    // embedding case at large corpus sizes
    val wide = SimSearch.signBuckets(embDf, bits = 40).cache()
    assert(wide.count() > 0 && wide.select(length(col("bucket"))).head.getInt(0) == 40)
  }

  test("top tokens: k heavy hitters by doc frequency, top-k plan, df sane") {
    val top = TextOps.topTokens(docsDf, k = 20)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject, not a global sort:\n${plan.take(400)}")
    val rows = top.collect()
    assert(rows.length == 20)
    val nDocs = docsDf.count()
    val dfs = rows.map(_.getLong(1))
    assert(dfs.forall(d => d >= 1 && d <= nDocs), "df must be within [1, nDocs]")
    assert(dfs.sameElements(dfs.sorted(Ordering[Long].reverse)), "rows ordered by df desc")
  }

  test("splits: deterministic, partition every doc, never straddle a dup cluster") {
    val split1 = Sampling.leakFreeSplit(docsDf).cache()
    assert(split1.count() == docsDf.count(), "every doc gets exactly one assignment")
    // leak-free: a normalized-text cluster maps to exactly one split
    val straddled = split1.groupBy(col("norm_hash"))
      .agg(count_distinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddled.isEmpty, "no dup cluster may straddle splits")
    // deterministic: a permuted re-read produces the identical assignment
    val split2 = Sampling.leakFreeSplit(docsDf.orderBy(col("doc_id").desc)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    split1.collect().foreach { r =>
      assert(split2(r.getAs[Long]("doc_id")) == r.getAs[String]("split"),
        "assignment must be a property of the data, not the run")
    }
    // the plain hash split covers the same corpus with sane ratios
    val buckets = Sampling.hashSplit(docsDf).groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets.values.sum == docsDf.count())
    assert(buckets("train") > buckets.getOrElse("valid", 0L),
      s"train must dominate the 90/5/5 cut: $buckets")
    // totality under nulls: a null-text doc still gets an assignment,
    // clustered with empty-text docs (not silently dropped)
    import spark.implicits._
    val withNulls = Seq((1L, "same text"), (2L, "same text"),
      (3L, null.asInstanceOf[String]), (4L, "")).toDF("doc_id", "text")
    val asg = Sampling.leakFreeSplit(withNulls).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(asg.size == 4, s"null/empty texts must still be assigned: $asg")
    assert(asg(3L) == asg(4L), "null text clusters with empty text")
    assert(asg(1L) == asg(2L), "exact dups share a split")
  }

  test("hash sampling: monotone in fraction, deterministic, mixture unions per-source samples") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val s25 = ids(Sampling.sampleByHash(docsDf, 0.25))
    val s50 = ids(Sampling.sampleByHash(docsDf, 0.50))
    assert(s25.subsetOf(s50),
      "threshold sampling must be monotone: growing the fraction only adds rows")
    assert(ids(Sampling.sampleByHash(docsDf, 0.50)) == s50, "deterministic across runs")
    val n = docsDf.count().toDouble
    assert(math.abs(s50.size / n - 0.5) < 0.1, s"~half the corpus expected, got ${s50.size}/$n")
    assert(ids(Sampling.sampleByHash(docsDf, 1.0)).size == n.toLong, "fraction 1.0 keeps everything")
    // mixture: same table twice under different salts → independent draws
    val mixed = Sampling.mixture(Seq((docsDf.select("doc_id", "text"), 0.5),
      (docsDf.select("doc_id", "text"), 0.5)))
    assert(mixed.count() > s50.size, "two independent 50% draws overlap but union-count exceeds one draw")
    // epoch multipliers: weight 2.5 = two full copies + a fractional draw
    val epochs = Sampling.mixture(Seq((docsDf.select("doc_id", "text"), 2.5))).count()
    assert(epochs > 2 * n.toLong && epochs < 3 * n.toLong,
      s"weight 2.5 must repeat the corpus twice plus ~half, got $epochs of $n")
    assert(Sampling.mixture(Seq((docsDf.select("doc_id", "text"), 0.0))).count() == 0,
      "weight 0 contributes nothing")
    intercept[IllegalArgumentException](Sampling.mixture(Seq.empty))
    intercept[IllegalArgumentException](Sampling.sampleByHash(docsDf, Double.NaN))
    intercept[IllegalArgumentException](Sampling.mixture(
      Seq((docsDf.select("doc_id", "text"), -1.0))))
  }

  test("stratified sampling: per-stratum monotone, raising one stratum leaves others untouched") {
    import spark.implicits._
    val docs = docsDf
    val lo = Sampling.stratifiedSampleByHash(docs, "lang", Map("en" -> 0.3), 0.1)
    val hi = Sampling.stratifiedSampleByHash(docs, "lang", Map("en" -> 0.6), 0.1)
    def ids(df: org.apache.spark.sql.DataFrame, lang: String): Set[Long] =
      df.filter($"lang" === lang).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(lo, "en").subsetOf(ids(hi, "en")),
      "a stratum's draw must grow monotonically with its fraction")
    val otherLo = lo.filter($"lang" =!= "en").select("doc_id")
    val otherHi = hi.filter($"lang" =!= "en").select("doc_id")
    assert(otherLo.exceptAll(otherHi).isEmpty && otherHi.exceptAll(otherLo).isEmpty,
      "changing one stratum's fraction must not move any other stratum's draw")
    // default fraction 0 excludes unlisted strata; fraction 1 keeps a stratum whole
    val only = Sampling.stratifiedSampleByHash(docs, "lang", Map("en" -> 1.0))
    assert(only.filter($"lang" =!= "en").isEmpty)
    assert(only.count() == docs.filter($"lang" === "en").count())
  }

  test("temperature sampling: min stratum kept whole, flattening law, deterministic") {
    import spark.implicits._
    val docs = docsDf
    val counts = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minSrc = counts.minBy(_._2)._1
    val fr = Sampling.temperatureFractions(docs, "lang")
    // anchor: the smallest source samples at exactly rate 1 — whole
    assert(math.abs(fr(minSrc) - 1.0) < 1e-15)
    val out = Sampling.temperatureQ(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out(minSrc) == counts(minSrc), "smallest source must survive whole")
    // flattening: sampled size ratios are compressed toward 1 — every
    // source's EXPECTED size is sqrt(n_s * n_min), so no source may
    // exceed sqrt(n_max * n_min) by much (hash-draw spread at these
    // sizes stays well under 2x the expectation)
    val nMin = counts.values.min.toDouble
    counts.foreach { case (s, n) =>
      val expected = math.sqrt(n * nMin)
      assert(out.getOrElse(s, 0L) <= expected * 2 + 5, s"source $s over-sampled")
    }
    // deterministic: a second run draws the identical per-source sizes
    val again = Sampling.temperatureQ(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("shards: complete deterministic partition; writeShards round-trips in order_key order") {
    val docs = docsDf
    val a = Sampling.assignShards(docs, 8).cache()
    assert(a.count() == docs.count())
    assert(a.filter(col("shard") < 0 || col("shard") >= 8).isEmpty)
    assert(a.exceptAll(Sampling.assignShards(docs, 8)).isEmpty, "assignment must be deterministic")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Sampling.writeShards(docs.select("doc_id", "text"), dir, 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // every shard's rows all hash to one task, so each shard=K directory
    // is one file whose row order IS the deterministic shuffled order
    val keys = spark.read.parquet(s"$dir/shard=0")
      .select("order_key").collect().map(_.getLong(0)).toSeq
    assert(keys.nonEmpty && keys == keys.sorted,
      "a shard must read back in ascending order_key order")
  }

  test("repetition scores: degenerate text flagged, diverse text kept, short docs total") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(40)("spam").mkString(" ")), // one token repeated
      (2L, (1 to 40).map(i => s"w$i").mkString(" ")), // fully diverse
      (3L, "single"), // too short for any gram
      (4L, "   ")) // no non-empty tokens → no row
      .toDF("doc_id", "text")
    val got = TextOps.repetitionScores(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(4L))
    val spam = got(1L)
    assert(spam.getAs[Double]("top_token_frac") == 1.0)
    assert(spam.getAs[Double]("dup_2gram_frac") > 0.9)
    assert(spam.getAs[Long]("keep") == 0L)
    val diverse = got(2L)
    assert(diverse.getAs[Double]("dup_2gram_frac") == 0.0)
    assert(diverse.getAs[Long]("keep") == 1L)
    val short = got(3L)
    assert(short.getAs[Double]("dup_2gram_frac") == 0.0
      && short.getAs[Double]("dup_3gram_frac") == 0.0,
      "sub-gram docs must score zero, not build a descending sequence")
  }

  test("decontamination: embedded eval text flags the host doc by containment") {
    import spark.implicits._
    val evalDoc = (1L, (1 to 10).map(i => s"e$i").mkString(" ")) // 10 tokens → 3 8-grams
    val host = (100L,
      ((1 to 10).map(i => s"e$i") ++ (1 to 30).map(i => s"h$i")).mkString(" "))
    val clean = (101L, (1 to 40).map(i => s"c$i").mkString(" "))
    val docs = Seq(evalDoc, host, clean).toDF("doc_id", "text")
    val got = Dedup.contamination(
      docs.filter($"doc_id" >= 100), docs.filter($"doc_id" < 100)).collect()
    assert(got.map(_.getLong(0)).toSet == Set(100L),
      "only the host doc carries eval n-grams")
    val r = got.head
    assert(r.getAs[Long]("n_shared") == 3,
      "all three eval 8-grams occur verbatim in the host")
    assert(r.getAs[Long]("n_shingles") == 33)
    val c = r.getAs[Double]("contamination")
    assert(c > 0 && c <= 1.0 && math.abs(c - 3.0 / 33) < 1e-12)
  }

  test("sequence packing: offsets inside the budget, sequences contiguous, deterministic") {
    val budget = 128
    val packed = Sampling.packSequences(docsDf, tokenBudget = budget, nShards = 4).cache()
    assert(packed.count() == docsDf.count())
    assert(packed.filter(col("offset") < 0 || col("offset") >= budget).isEmpty,
      "every document's start offset must fall inside its sequence")
    assert(packed.filter(col("bin") < 0).isEmpty)
    // offsets are a contiguous token layout → sequence ids per shard are
    // dense 0..last (a gap would mean tokens vanished)
    val dense = packed.groupBy("shard")
      .agg(count_distinct(col("bin")).as("n"), max(col("bin")).as("m"))
      .filter(col("n") =!= col("m") + 1)
    assert(dense.isEmpty, "sequence ids must be dense per shard")
    assert(packed.exceptAll(
      Sampling.packSequences(docsDf, tokenBudget = budget, nShards = 4)).isEmpty,
      "packing must be a pure property of the data")
    packed.unpersist()
  }

  test("int8 quantization: codes bounded, reconstruction within scale/2, zero vector exact") {
    import spark.implicits._
    val q = SimSearch.quantizeInt8(embDf).cache()
    assert(q.count() == embDf.count())
    assert(q.filter(exists(col("codes"), c => abs(c) > 127)).isEmpty,
      "codes must stay within the int8 symmetric range")
    // per-element reconstruction error ≤ scale/2 (the defining bound)
    val bad = q.filter(col("scale") > 0)
      .join(embDf, "vec_id")
      .filter(exists(
        zip_with(col("embedding").cast("array<double>"),
          zip_with(col("codes"), array_repeat(col("scale"), size(col("codes"))),
            (c, s) => c * s),
          (x, r) => abs(x - r) > col("scale") / 2 + lit(1e-12)),
        b => b))
    assert(bad.isEmpty, "every element must reconstruct within half a quantization step")
    q.unpersist()
    val zero = SimSearch.quantizeInt8(
      Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")).head()
    assert(zero.getAs[Double]("scale") == 0.0)
    assert(zero.getAs[Seq[Int]]("codes").forall(_ == 0))
  }

  test("quality scores: ratios bounded, token counts positive") {
    val q = TextOps.qualityScores(docsDf).cache()
    assert(q.filter(col("n_tokens") <= 0).isEmpty)
    assert(q.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).isEmpty)
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).isEmpty)
  }

  test("text stats cover every language present") {
    val stats = TextOps.textStats(docsDf)
    val langs = docsDf
      .select("lang").distinct().count()
    assert(stats.count() == langs)
  }
  test("curriculum order: slice prefix sums equal one global rank, any slicing") {
    import org.apache.spark.sql.expressions.Window
    // reference: one global row_number / running token sum (fine on a
    // test fixture; the operator exists to avoid exactly this plan)
    val tk = split(lower(trim(col("text"))), "\\s+")
    val ratio = size(filter(tk, t => t.isin(TextOps.EnStopwords: _*)))
      .cast("double") / size(tk)
    val w = Window.orderBy(col("tier").asc, col("ok").asc, col("doc_id").asc)
    val expected = docsDf.select(col("doc_id"),
        conv(substring(md5(concat(lit("order:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("ok"),
        size(tk).cast("long").as("n_tok"),
        when(ratio >= 0.15, lit(0L)).when(ratio >= 0.05, lit(1L))
          .otherwise(lit(2L)).as("tier"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .withColumn("start", sum(col("n_tok")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("n_tok"))
      .select("doc_id", "tier", "n_tok", "pos", "start")
    // slice counts that do NOT divide the corpus evenly, incl. k = 1
    for (k <- Seq(1, 7)) {
      val got = Sampling.curriculumRanked(docsDf, subSplits = k)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"distributed curriculum rank must equal the global sort at subSplits=$k")
      PipelineCaches.release(spark)
    }
    // budget selection is a prefix of the curriculum: last selected pos
    // + 1 = number selected (no holes), and adding any next doc would
    // overshoot the 60% budget
    val sel = Sampling.tokenBudgetQ(docsDf)
      .agg(sum(col("n_docs")).as("n"), max(col("last_pos")).as("lp"),
        sum(col("n_tokens")).as("tt")).head()
    PipelineCaches.release(spark)
    assert(sel.getLong(1) == sel.getLong(0) - 1, "selection must be a contiguous prefix")
    val totals = expected.agg(sum(col("n_tok"))).head().getLong(0)
    val budget = math.floor(totals * 0.6).toLong
    assert(sel.getLong(2) <= budget)
    val nextTok = expected.filter(col("pos") === sel.getLong(0)).head().getLong(2)
    assert(sel.getLong(2) + nextTok > budget, "greedy prefix must be maximal")
  }
  test("hybrid RRF: dense final ranks, non-increasing fused score, exact rank law") {
    val out = SimSearch.hybridRrfQ(spark, sf).collect()
      .sortBy(_.getAs[Long]("rank"))
    PipelineCaches.release(spark)
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("rank")).toSeq == (1L to out.length).toSeq,
      "final ranks must be dense 1..n")
    val scores = out.map(_.getAs[Double]("rrf"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "fused score must be non-increasing in rank")
    // the fused score is an exact function of the two source ranks
    out.foreach { r =>
      val rt = Option(r.getAs[java.lang.Long]("r_text")).map(_.toLong)
      val rv = Option(r.getAs[java.lang.Long]("r_vec")).map(_.toLong)
      assert(rt.isDefined || rv.isDefined, "a fused row must come from somewhere")
      val want = BigDecimal(rt.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60.0 + x)).getOrElse(0.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf") == want, s"rrf law broken at $r")
    }
  }
  test("bitext mining IVF-blocked: twin mined within its cell, pairs share cells") {
    import spark.implicits._
    // centroids (ids 5..20) are orthogonal one-hots e_i in 32 dims, so
    // every corpus vector has an unambiguous cell; probe 0 (X pool) and
    // its identical twin 1 (Y pool) sit OFF-axis at e_25 + 0.3*e_5 ->
    // both land in cell 5, where the only other member is centroid 5
    // itself (odd id -> Y pool) at cosine ~ 0.287 -- margins stay
    // positive (identical-vector hubs would zero them; margin mining
    // by design rejects hubs)
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(32)(j => if (j == i) 1f else 0f)
    val twin = Array.tabulate(32)(j =>
      if (j == 25) 1f else if (j == 5) 0.3f else 0f)
    val rows = Seq((0L, twin, 0), (1L, twin, 1)) ++
      (5L to 20L).map(i => (i, oneHot(i.toInt), (i % 2).toInt))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = SimSearch.bitextMineIvfQ(emb, k = 4, nProbes = 50)
      .collect().map(r => r.getLong(0) -> r).toMap
    PipelineCaches.release(spark)
    assert(out.contains(0L), "identical twin must be mined despite blocking")
    assert(out(0L).getAs[Long]("y_id") == 1L)
    assert(out(0L).getAs[Long]("c_nano") >= 999999999L)
    // blocking contract: nothing outside a shared cell can be mined --
    // the even one-hot centroids are probes too, but their cells hold
    // no Y vectors, so probe 0's pair is the ONLY output row
    assert(out.size == 1, s"expected exactly one mined pair, got $out")
    // margin law with actual neighborhood sizes: forward = {twin,
    // centroid5}, reverse = {probe} -> margin = 3*c - (c + c5) - c
    // (0.3f -> double is NOT 0.3 — replicate the engine's widening)
    val x = 0.3f.toDouble
    val c5 = math.floor(x / math.sqrt(1.0 + x * x) * 1e9).toLong
    val c = out(0L).getAs[Long]("c_nano")
    assert(out(0L).getAs[Long]("margin_nano") == 3 * c - (c + c5) - c,
      "margin must use actual (nx, ny) neighborhood sizes")
  }
  test("bitext mining: identical twin wins, margin law exact, acceptance prunes") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(8)(i => (((seed * 31 + i * 17) % 13) - 6).toFloat / 6f)
    // X pool (even labels): probe 0 has an identical twin in Y; probe 2
    // is a lone direction. Y pool (odd labels): the twin + 4 noise docs.
    val rows = Seq(
      (0L, vec(5), 0), (2L, vec(9), 2),
      (101L, vec(5), 1), (103L, vec(1), 1), (105L, vec(2), 1),
      (107L, vec(3), 3), (109L, vec(4), 3))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = SimSearch.bitextMineQ(emb, k = 4, nProbes = 50).collect()
      .map(r => r.getLong(0) -> r).toMap
    PipelineCaches.release(spark)
    // probe 0's twin must be the mined pair; its cosine is 1 up to the
    // last ulp of the normalization (floor lands on 1e9 - 1 or 1e9 --
    // whichever, identically on both engines)
    assert(out.contains(0L), "identical twin must be mined")
    assert(out(0L).getAs[Long]("y_id") == 101L)
    assert(out(0L).getAs[Long]("c_nano") >= 999999999L)
    // margin law: margin = 2k*c - sx - sy recomputed from the declared
    // nano cosines (driver replica over the tiny fixture)
    def nano(a: Array[Float], b: Array[Float]): Long = {
      def d(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      math.floor(d(ad, bd) / (math.sqrt(d(ad, ad)) * math.sqrt(d(bd, bd))) * 1e9).toLong
    }
    val xsV = Map(0L -> vec(5), 2L -> vec(9))
    val ysV = Map(101L -> vec(5), 103L -> vec(1), 105L -> vec(2),
      107L -> vec(3), 109L -> vec(4))
    out.foreach { case (pid, r) =>
      val y = r.getAs[Long]("y_id")
      val sx = ysV.values.map(nano(xsV(pid), _)).toSeq.sorted.reverse.take(4).sum
      val sy = xsV.values.map(nano(ysV(y), _)).toSeq.sorted.reverse
        .take(4).sum // |X| = 2 < k: sum over all of X
      val c = r.getAs[Long]("c_nano")
      assert(r.getAs[Long]("margin_nano") == 8 * c - sx - sy,
        s"margin law broken for probe $pid")
      assert(800L * c > 110L * (sx + sy), "accepted pair must clear the ratio bar")
    }
  }
  test("ccnet buckets: tercile law per language — sizes within 1, boundaries ordered") {
    val rows = Scoring.ccnetBucketsQ(docsDf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    PipelineCaches.release(spark)
    assert(rows.nonEmpty)
    val langs = rows.keys.map(_._1).toSeq.distinct
    langs.foreach { l =>
      val got = Seq("head", "middle", "tail").flatMap(b => rows.get((l, b)))
      // every scored language splits into all three buckets whose sizes
      // differ by at most one (the ntile contract)
      assert(got.size == 3, s"$l must have all three buckets")
      val sizes = got.map(_._1)
      assert(sizes.max - sizes.min <= 1, s"$l tercile sizes $sizes")
      // score boundaries are ordered: head's worst <= middle's best, etc.
      val Seq(h, m, t) = got
      assert(h._3 <= m._2 + 1e-9 && m._3 <= t._2 + 1e-9,
        s"$l bucket boundaries out of order: $got")
    }
  }
  test("MMR: the near-duplicate of the top hit is deferred, ranks exact") {
    import spark.implicits._
    // probe 0; candidate 2 is a near-twin of top hit 1 (sim ~0.9998,
    // slightly less relevant); 3 and 4 match 1's relevance but live on
    // diverse axes (sim ~0.51 to everything selected) — at lambda 0.7
    // the twin's penalty (3 * 0.9998) buries it: MMR picks 1, 3, 4
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.71f, 0.70f, 0f, 0f)),
      (2L, Array(0.70f, 0.71f, 0f, 0f)),
      (3L, Array(0.71f, 0f, 0.70f, 0f)),
      (4L, Array(0.71f, 0f, 0f, 0.70f))).toDF("vec_id", "embedding")
    val out = SimSearch.mmrQ(rows, nCand = 4, kOut = 3).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    PipelineCaches.release(spark)
    assert(out == Seq(1L, 3L, 4L),
      s"the near-twin must be deferred behind both diverse axes, got $out")
  }
  test("MMR batch: per-probe greedy independent, probe 0 replays the single form") {
    import spark.implicits._
    // two probes sharing one candidate pool: probe 0 on the x-axis
    // (the single-probe fixture), probe 1 on the y-axis — each probe's
    // selection must be its own greedy, and probe 0's list must equal
    // mmrQ's on the same candidates
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0.71f, 0.70f, 0f, 0f)),
      (3L, Array(0.70f, 0.71f, 0f, 0f)),
      (4L, Array(0.71f, 0f, 0.70f, 0f)),
      (5L, Array(0.71f, 0f, 0f, 0.70f))).toDF("vec_id", "embedding")
    val batch = SimSearch.mmrBatchQ(rows, nProbes = 2, nCand = 4, kOut = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    PipelineCaches.release(spark)
    assert(batch.size == 6, s"2 probes x 3 ranks, got ${batch.keySet}")
    // probe 1 must NOT mirror probe 0: its top relevance hit is 3
    // (y-heavy), probe 0's is 2 (x-heavy)
    assert(batch((0L, 1L))._1 == 2L, s"probe 0 rank 1: ${batch((0L, 1L))}")
    assert(batch((1L, 1L))._1 == 3L, s"probe 1 rank 1: ${batch((1L, 1L))}")
    // probe 0's full list replays the single-probe greedy over the
    // same pool (mmrQ excludes only vec_id 0, so align candidates by
    // dropping probe 1's row for the single call)
    val single = SimSearch.mmrQ(rows.filter(col("vec_id") =!= 1L),
      nCand = 4, kOut = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    PipelineCaches.release(spark)
    (1L to 3L).foreach { rk =>
      assert(batch((0L, rk)) == single(rk),
        s"probe 0 rank $rk diverged from the single-probe greedy")
    }
  }
}
