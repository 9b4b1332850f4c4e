package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws of the SentencePiece-style unigram tokenizer (q_unigram_train /
  * q_unigram_encode): lossless reconstruction, the char floor, the
  * prune schedule, and an independent driver replay of the Viterbi
  * objective (the ScoringSpec convention — the same declared algorithm
  * reimplemented in plain Scala must agree bit-for-bit). */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private val L = graft.functions.UnigramSegmentEval.MaxPieceLen

  /** Plain-Scala Viterbi under the declared objective — independent of
    * the native expression's implementation. */
  private def viterbiRef(w: String, vocab: Map[String, Long]): Seq[String] = {
    val chars = {
      val b = Seq.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + cc); i += cc
      }
      b.result()
    }
    val m = chars.length
    val dp = Array.fill[(Long, Long)](m + 1)(null)
    val back = new Array[Int](m + 1)
    dp(0) = (0L, 0L)
    for (p <- 1 to m) {
      var best: (Long, Long) = null; var bl = 0
      for (len <- 1 to math.min(L, p)) {
        val piece = chars.slice(p - len, p).mkString
        val u = vocab.get(piece)
          .orElse(if (len == 1) Some(0L) else None)
        u.foreach { uu =>
          val cand = (dp(p - len)._1 + 1, dp(p - len)._2 + uu)
          if (best == null || cand._1 < best._1 ||
              (cand._1 == best._1 && cand._2 > best._2) ||
              (cand._1 == best._1 && cand._2 == best._2 && len > bl)) {
            best = cand; bl = len
          }
        }
      }
      dp(p) = best; back(p) = bl
    }
    val out = List.newBuilder[String]
    var pos = m
    var acc = List.empty[String]
    while (pos > 0) {
      val len = back(pos)
      acc = chars.slice(pos - len, pos).mkString :: acc
      pos -= len
    }
    out ++= acc
    out.result()
  }

  test("lossless reconstruction: concatenating the encode pieces " +
    "reproduces every vocab word exactly") {
    val enc = Unigram.unigramEncodeQ(spark, sf).collect()
    PipelineCaches.release(spark)
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getString(3).replace(" ", "") == r.getString(0),
        s"word '${r.getString(0)}' did not reconstruct from '${r.getString(3)}'")
    }
  }

  test("char floor + prune schedule: the trained vocab keeps every " +
    "corpus code point and at most keeps.last multi-char pieces") {
    val v = Unigram.unigramTrainQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    PipelineCaches.release(spark)
    val corpusChars = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().as[String].collect().toSet
    val pieces = v.map(_._1).toSet
    assert(corpusChars.subsetOf(pieces),
      s"missing chars: ${corpusChars -- pieces}")
    val multi = v.filter(_._1.length > 1)
    assert(multi.nonEmpty && multi.size <= Unigram.DefaultKeeps.last,
      s"multi-char pieces ${multi.size} vs keep ${Unigram.DefaultKeeps.last}")
  }

  test("driver replay: the native Viterbi expression equals the " +
    "independent Scala DP under the trained vocab, word for word") {
    val words = Bpe.wordCounts(graft.sources.Tables.documents(spark, sf))
      .as[(String, Long)].collect().toSeq
    val vocab = Unigram.unigramTrainQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Unigram.unigramEncodeQ(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    PipelineCaches.release(spark)
    val vm = vocab.toMap
    words.foreach { case (w, _) =>
      assert(got(w) == viterbiRef(w, vm).mkString(" "),
        s"viterbi divergence on '$w'")
    }
  }

  test("objective law: no segmentation under the trained vocab uses " +
    "fewer pieces (brute force over every split of short words)") {
    val vocab = Unigram.unigramTrainQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val enc = Unigram.unigramEncodeQ(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(3).split(" ").length).toMap
    PipelineCaches.release(spark)
    def minPieces(w: String): Int = {
      val m = w.length
      val dp = Array.fill(m + 1)(Int.MaxValue); dp(0) = 0
      for (p <- 1 to m; len <- 1 to math.min(L, p))
        if ((vocab.contains(w.substring(p - len, p)) || len == 1) &&
            dp(p - len) != Int.MaxValue)
          dp(p) = math.min(dp(p), dp(p - len) + 1)
      dp(m)
    }
    enc.filter(_._1.length <= 12).foreach { case (w, np) =>
      assert(np == minPieces(w), s"'$w': got $np pieces, min ${minPieces(w)}")
    }
  }

  test("persisted model: encode off the frozen vocab equals the batch " +
    "train-and-encode row for row, and the model round-trips parquet " +
    "exactly") {
    val dir = java.nio.file.Files.createTempDirectory("unigram_model").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    Unigram.writeUnigramModel(docs, dir)
    val words = PipelineCaches.track(Bpe.wordCounts(docs))
    val trained = Unigram.train(words)
    PipelineCaches.release(spark)
    assert(Unigram.readUnigramModel(spark, dir) == trained,
      "the reloaded (piece, utility) model must round-trip bit-exactly")
    val batch = Unigram.unigramEncodeQ(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    val incr = Unigram.encodeFromModel(spark, dir, docs).collect()
      .map(_.toString).sorted.toSeq
    PipelineCaches.release(spark)
    assert(incr == batch,
      "frozen-model encode must equal the batch train-and-encode")
  }

  test("OOV robustness: a word with characters the corpus never saw " +
    "still segments losslessly (single-char fallback)") {
    graft.functions.UnigramSegment.register(spark)
    val vocab = Unigram.unigramTrainQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    PipelineCaches.release(spark)
    val b64 = graft.functions.UnigramSegment.encodeVocab(vocab)
    val out = Seq("zq1xy", "über").toDF("word")
      .select(col("word"), expr(
        s"${graft.functions.UnigramSegment.FnName}(word, '$b64')").as("sg"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](1).mkString == r.getString(0))
    }
  }

  test("separator-class control chars (U+001E/U+001F) in corpus words " +
    "train and encode losslessly instead of aborting (round-17 ADVICE: " +
    "the vocab literal is length-prefixed, no reserved characters)") {
    graft.functions.UnigramSegment.register(spark)
    val weird = "ab\u001ecd\u001fef"
    val docs = Seq((1L, s"$weird plain words here"),
      (2L, s"$weird plain tokens again")).toDF("doc_id", "text")
    val words = PipelineCaches.track(Bpe.wordCounts(docs))
    val vocab = Unigram.train(words, seedMulti = 16, keeps = Seq(8))
    PipelineCaches.release(spark)
    val b64 = graft.functions.UnigramSegment.encodeVocab(vocab)
    val out = Seq(weird).toDF("word")
      .select(expr(
        s"${graft.functions.UnigramSegment.FnName}(word, '$b64')").as("sg"))
      .collect()
    assert(out.head.getSeq[String](0).mkString == weird,
      "lossless segmentation over separator-class characters")
  }
}
