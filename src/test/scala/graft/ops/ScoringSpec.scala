package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.SparkSuite
import graft.sources.Tables

/** Exact driver-side reference replays for the scoring operators over
  * the real sf0.001 documents table. */
class ScoringSpec extends SparkSuite {

  private lazy val docs: Seq[(Long, String, String, String)] =
    Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq

  private def toksOf(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("bm25 matches the driver-side reference") {
    val terms = Seq("data", "query", "engine", "fast")
    val tokenized = docs.map { case (id, text, _, _) => id -> toksOf(text) }
    val withTok = tokenized.filter(_._2.nonEmpty)
    val nDocs = withTok.size.toDouble
    val avgdl = withTok.map(_._2.size).sum.toDouble / nDocs
    val dfm = terms.map(t => t -> withTok.count(_._2.contains(t)).toDouble).toMap
    val want = withTok.flatMap { case (id, tk) =>
      val matched = terms.filter(tk.contains)
      if (matched.isEmpty) None
      else {
        val dl = tk.size.toDouble
        val score = matched.map { t =>
          val tf = tk.count(_ == t).toDouble
          val idf = math.log((nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
          idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        }.sum
        Some(id -> (matched.size.toLong, score))
      }
    }.toMap
    val got = Scoring.bm25Q(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, s)) =>
      assert(n == want(id)._1, s"doc $id terms")
      assert(math.abs(s - want(id)._2) < 1e-5, s"doc $id bm25 $s vs ${want(id)._2}")
    }
  }

  test("dsir matches the driver-side reference; target docs are never scored") {
    val nBuckets = 256
    def bucket(tok: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(tok.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % nBuckets
    }
    val flagged = docs.map { case (id, text, lang, source) =>
      (id, toksOf(text).map(bucket),
        lang == "en" && Set("src1", "src2", "src3").contains(source))
    }
    val tCnt = new Array[Long](nBuckets)
    val rCnt = new Array[Long](nBuckets)
    flagged.foreach { case (_, bks, isT) =>
      bks.foreach(b => if (isT) tCnt(b.toInt) += 1 else rCnt(b.toInt) += 1)
    }
    val (tTot, rTot) = (tCnt.sum.toDouble, rCnt.sum.toDouble)
    def lam(b: Int): Double =
      math.log((tCnt(b) + 1.0) / (tTot + nBuckets)) -
        math.log((rCnt(b) + 1.0) / (rTot + nBuckets))
    val want = flagged.filter(f => !f._3 && f._2.nonEmpty).map { case (id, bks, _) =>
      id -> (bks.size.toLong, bks.map(b => lam(b.toInt)).sum / bks.size)
    }.toMap
    val got = Scoring.dsirQ(spark, Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet, "candidate set mismatch")
    got.foreach { case (id, (n, w)) =>
      assert(n == want(id)._1, s"doc $id n_tok")
      assert(math.abs(w - want(id)._2) < 1e-5, s"doc $id weight $w vs ${want(id)._2}")
    }
    // no target doc is ever scored
    val targets = flagged.filter(_._3).map(_._1).toSet
    assert(got.keySet.intersect(targets).isEmpty)
  }

  test("ngram LM matches the driver-side reference") {
    val alpha = 0.1
    // train the bigram model exactly as declared: en slice, unigram
    // counts over ALL positions, bigram counts over adjacent pairs
    val uniC = collection.mutable.Map.empty[String, Long]
    val biC = collection.mutable.Map.empty[(String, String), Long]
    docs.filter(_._3 == "en").foreach { case (_, text, _, _) =>
      val tk = toksOf(text)
      tk.foreach(t => uniC(t) = uniC.getOrElse(t, 0L) + 1)
      tk.sliding(2).filter(_.size == 2)
        .foreach(p => biC((p(0), p(1))) = biC.getOrElse((p(0), p(1)), 0L) + 1)
    }
    val v = uniC.size
    def prob(a0: String, b0: String): Double = {
      val a = if (uniC.contains(a0)) a0 else "<unk>"
      val b = if (uniC.contains(b0)) b0 else "<unk>"
      (biC.getOrElse((a, b), 0L) + alpha) /
        (uniC.getOrElse(a, 0L) + alpha * (v + 1))
    }
    val want = docs.flatMap { case (id, text, lang, _) =>
      val tk = toksOf(text)
      if (tk.size < 2) None
      else {
        val lps = tk.sliding(2).filter(_.size == 2)
          .map(p => math.log(prob(p(0), p(1)))).toSeq
        Some(id -> (lang, lps.size.toLong, -lps.sum / lps.size))
      }
    }.toMap
    val got = Scoring.ngramLmQ(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet, "scored set mismatch")
    got.foreach { case (id, (lang, n, s)) =>
      assert(lang == want(id)._1 && n == want(id)._2, s"doc $id lang/n_bigrams")
      assert(math.abs(s - want(id)._3) < 1e-5, s"doc $id logppl $s vs ${want(id)._3}")
    }
    graft.ops.PipelineCaches.release(spark)
  }

  test("ngram LM: OOV gibberish scores strictly worse than in-domain text") {
    import spark.implicits._
    // 20 train docs of a tiny repeated vocabulary; one fluent doc made of
    // seen bigrams; one gibberish doc of wholly unseen tokens
    val train = (0 until 20).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran", "en", "s", 0L))
    val probes = Seq(
      (100L, "the cat sat on the mat", "xx", "s", 0L),
      (101L, "zqx wvu ponm lkj ihg fed", "xx", "s", 0L))
    val df = (train ++ probes)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Scoring.ngramLmQ(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(100L) < got(101L),
      s"fluent ${got(100L)} should beat gibberish ${got(101L)}")
    // fluent probe scores like the training text itself (same bigrams)
    assert(got(100L) < got.filter(_._1 < 20).values.max + 0.5)
    graft.ops.PipelineCaches.release(spark)
  }

  test("quality classifier matches the driver-side reference exactly") {
    val dim = 1024
    def md60(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def wm(bucket: Long): Long = md60(s"w:$bucket") % 2001L - 1000L
    val want = docs.map { case (id, text, _, _) =>
      val bks = toksOf(text).map(t => md60(t) % dim)
      id -> (bks.size.toLong, bks.map(wm).sum)
    }.filter(_._2._1 > 0).toMap
    val got = Scoring.qualityClassifierQ(Tables.documents(spark, sf))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (n, logit, keep)) =>
      val (wn, wsum) = want(id)
      assert(n == wn, s"doc $id n_tokens")
      // integer-milli weights: the logit is ONE division of exact
      // integers — the replay is bit-equal, not epsilon-close
      assert(logit == wsum.toDouble / (wn * 1000.0), s"doc $id logit")
      assert(keep == (if (wsum >= 0) 1L else 0L), s"doc $id keep")
    }
    // the deterministic model splits this corpus non-trivially
    val kept = got.values.count(_._3 == 1L)
    assert(kept > 0 && kept < got.size, s"degenerate split: $kept of ${got.size}")
  }

  test("quality classifier plan: weight table broadcasts, one doc-keyed shuffle") {
    val plan = Scoring.qualityClassifierQ(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <= 1 data shuffle, got $exchanges\n$plan")
  }

  test("kneser-ney: hand-computed probabilities (the Francisco property, " +
    "seen-context interpolation, unseen-context backoff)") {
    import spark.implicits._
    // train (en): 'francisco' is frequent but completes ONE context;
    // 'day' completes three. Vocab = {san, francisco, a, day, b, c}
    // (V=6), bigram types = 7, N1+(·francisco)=1, N1+(·day)=3.
    val docs = Seq(
      (1L, "san francisco san francisco", "en", "s"),
      (2L, "a day b day c day", "en", "s"),
      // probes (fr → out of training): unseen context <unk> backs off
      // to the continuation unigram alone
      (3L, "zzz francisco", "fr", "s"),
      (4L, "zzz day", "fr", "s"),
      // seen context: interpolated discount law
      (5L, "san francisco", "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Scoring.kneserNeyQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val pcFrancisco = (1.0 + 1.0) / (7 + 6 + 1)
    val pcDay = (3.0 + 1.0) / (7 + 6 + 1)
    assert(got(3L)._1 == 1L && got(4L)._1 == 1L)
    assert(math.abs(got(3L)._2 - (-math.log(pcFrancisco))) < 2e-6,
      "unseen context must back off to Pc exactly")
    assert(math.abs(got(4L)._2 - (-math.log(pcDay))) < 2e-6)
    assert(got(3L)._2 > got(4L)._2,
      "Francisco property: single-context token scores below multi-context")
    // seen context san: c=2, c(san,francisco)=2, N1+(san·)=1
    val pSeen = (2.0 - 0.75) / 2.0 + 0.75 * 1.0 / 2.0 * pcFrancisco
    assert(math.abs(got(5L)._2 - (-math.log(pSeen))) < 2e-6,
      "seen context must follow the interpolated discount law")
  }

  test("maxsim matches a driver-side exact replay; a doc containing a " +
    "query term scores at least that term's self-dot") {
    val terms = Seq("data", "query", "engine", "fast")
    def md60(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def vec(t: String): Array[Long] =
      Array.tabulate(16)(j => md60(s"e:$t:$j") % 2001L - 1000L)
    val qv = terms.map(vec)
    val perTermMaxes = docs.collect { case (id, text, _, _)
        if toksOf(text).nonEmpty =>
      val dtoks = toksOf(text).distinct
      val maxes = qv.map(q => dtoks.map(s =>
        vec(s).zip(q).map { case (a, b) => a * b }.sum).max)
      id -> (dtoks, maxes)
    }.toMap
    val want = perTermMaxes.map { case (id, (dtoks, maxes)) =>
      id -> (dtoks.size.toLong, maxes.sum)
    }
    val got = Scoring.maxSimQ(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "engine maxsim must replay the integer reference")
    // presence law: for a doc containing query term t verbatim, the
    // per-term max is at least t's self-dot (the max ranges over a set
    // that includes t itself)
    val selfDots = terms.map(t => vec(t).map(x => x * x).sum)
    var checked = 0
    perTermMaxes.foreach { case (_, (dtoks, maxes)) =>
      terms.zipWithIndex.foreach { case (t, i) =>
        if (dtoks.contains(t)) {
          assert(maxes(i) >= selfDots(i),
            s"term '$t' present but max dot below its self-dot")
          checked += 1
        }
      }
    }
    assert(checked > 0, "fixture must contain at least one query term")
  }

  test("kneser-ney on the real corpus: finite scores, population equals " +
    "the add-alpha scorer's") {
    val kn = Scoring.kneserNeyQ(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val base = Scoring.ngramLmQ(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(kn.keySet == base.keySet,
      "both laws score exactly the ≥2-token population")
    assert(kn.values.forall(v => !v.isNaN && !v.isInfinite && v > 0.0))
  }

  test("rank correlation: exact driver replay; sign convention means " +
    "agreement is positive") {
    val docsT = Tables.documents(spark, sf)
    val clf = Scoring.qualityClassifierQ(docsT).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val lm = Scoring.ngramLmQ(docsT).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    graft.ops.PipelineCaches.release(spark)
    val ids = clf.keySet.intersect(lm.keySet).toSeq
    val rClf = ids.sortBy(id => (-clf(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val rLm = ids.sortBy(id => (lm(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val d2 = ids.map(id => { val d = rClf(id) - rLm(id); d * d }).sum
    val n = ids.size.toLong
    val want = BigDecimal(1.0 - 6.0 * d2.toDouble / (n * (n * n - 1)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Scoring.rankCorrQ(docsT).collect().head
    graft.ops.PipelineCaches.release(spark)
    assert(got.getLong(0) == n && got.getLong(1) == d2)
    assert(math.abs(got.getDouble(2) - want) < 2e-6)
    assert(got.getDouble(2) > -1.0 && got.getDouble(2) < 1.0)
  }
}
