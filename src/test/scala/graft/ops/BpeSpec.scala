package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BPE-training laws: the distributed train must equal an exact
  * driver-side reference (scan-based greedy merge), the replace-last
  * fold must realize greedy leftmost non-overlapping matching on the
  * adversarial overlap shapes, and each round's pair count must stay a
  * partial+final aggregate over the vocab table. */
class BpeSpec extends SparkSuite {

  /** Reference greedy application: lookahead scan, consume 2 on match. */
  private def applyRef(s: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.toList
  }

  test("driver replay: 6 learned merges match the exact scan-based reference") {
    val words = Bpe.wordCounts(graft.sources.Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var segs = words.map { case (w, n) => (w.map(_.toString).toList, n) }
    val want = (1 to 6).map { r =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (s, n) =>
        s.zip(s.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + n)
      }
      val ((a, b), cnt) = pc.toSeq.sortWith { (x, y) =>
        x._2 > y._2 || (x._2 == y._2 &&
          (x._1._1 < y._1._1 || (x._1._1 == y._1._1 && x._1._2 < y._1._2)))
      }.head
      segs = segs.map { case (s, n) => (applyRef(s, a, b), n) }
      (r.toLong, a, b, cnt)
    }.toList
    val got = Bpe.bpeMergesQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList.sortBy(_._1)
    assert(got == want)
  }

  test("applyMerge fold equals the lookahead scan on overlap-adversarial shapes") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),        // odd overlap run
      (Seq("a", "a", "a", "a"), "a", "a"),   // even overlap run
      (Seq("a", "b", "a", "b"), "a", "b"),   // repeated pair
      (Seq("a", "a", "b"), "a", "b"),        // match after near-miss
      (Seq("ab", "b", "a", "b"), "a", "b"),  // merged-token lookalike prefix
      (Seq("x"), "a", "b"),                  // singleton
      (Seq[String](), "a", "b")              // empty
    )
    cases.zipWithIndex.foreach { case ((syms, a, b), i) =>
      val got = Seq(Tuple1(syms)).toDF("sym")
        .select(Bpe.applyMerge(col("sym"), a, b).as("out"))
        .collect().head.getSeq[String](0).toList
      assert(got == applyRef(syms.toList, a, b), s"case $i: $syms merge ($a,$b)")
    }
  }

  test("encode: segmentation losslessly reconstructs every word; counts tie to corpus") {
    val enc = Bpe.bpeEncodeQ(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(enc.nonEmpty)
    enc.foreach { case (w, _, nSym, bpe) =>
      val syms = bpe.split(" ")
      assert(syms.mkString("") == w, s"lossy segmentation of '$w': '$bpe'")
      assert(syms.length == nSym.toInt)
    }
    assert(enc.exists(e => e._3 < e._1.length),
      "at least one word must actually compress under 6 merges")
    val corpusToks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "").count()
    assert(enc.map(_._2).sum == corpusToks)
  }

  test("native bpe_segment equals the composed charSymbols+applyMerge fold stack") {
    import spark.implicits._
    graft.functions.BpeSegment.register(spark)
    // rule lists exercising chained merges, merged-token reuse by a
    // LATER rule, and rules that never fire
    val ruleSets = Seq(
      Seq(("a", "a")),
      Seq(("a", "b"), ("ab", "c")),
      Seq(("b", "a"), ("ba", "ba")),
      Seq(("x", "y")),
      Seq(("a", "b"), ("c", "d"), ("ab", "cd")))
    val wordsDf = Seq("aaa", "aaaa", "abab", "aab", "abbab", "abcabc",
      "abcdabcd", "x", "banana", "bananana").toDF("word")
    ruleSets.foreach { rules =>
      val b64 = graft.functions.BpeSegment.encodeRules(rules)
      val composed = rules.foldLeft(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))) {
        case (c, (a, b)) => Bpe.applyMerge(c, a, b)
      }
      val rows = wordsDf.select(col("word"),
          expr(s"bpe_segment(word, '$b64')").as("nat"), composed.as("comp"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"word '${r.getString(0)}' rules $rules")
      }
    }
  }

  test("plan: pair counting is a partial+final aggregate; no corpus re-shuffle per round") {
    // the train's per-round job is over the CACHED vocab table; pin the
    // shape of one round's pair count directly
    val words = Bpe.wordCounts(graft.sources.Tables.documents(spark, sf))
    val sym = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    val plan = words
      .select(col("n"), sym.as("sym"))
      .select(col("n"),
        slice(col("sym"), lit(1), size(col("sym")) - 1).as("sa"),
        slice(col("sym"), lit(2), size(col("sym")) - 1).as("sb"))
      .select(col("n"), explode(arrays_zip(col("sa"), col("sb"))).as("p"))
      .groupBy(col("p.sa").as("sym_a"), col("p.sb").as("sym_b"))
      .agg(sum(col("n")).as("n_pair"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan.take(600))
  }

  test("merge symbols containing U+001E/U+001F (and ':'/';') round-trip " +
    "the length-prefixed rule encoding (round-17 ADVICE: no reserved " +
    "characters, no abort on separator-class corpus bytes)") {
    import spark.implicits._
    graft.functions.BpeSegment.register(spark)
    val rs = "\u001e"; val ps = "\u001f"
    val rules = Seq((rs, rs), (rs + rs, ps), (":", ";"))
    val b64 = graft.functions.BpeSegment.encodeRules(rules)
    val word = rs + rs + ps + ":" + ";"
    val seg = Seq(word).toDF("word")
      .select(expr(s"bpe_segment(word, '$b64')").as("sg")).collect()
      .head.getSeq[String](0)
    assert(seg.mkString == word, "lossless")
    assert(seg == Seq(rs + rs + ps, ":;"),
      "merges fire across the former separator characters")
  }
}
