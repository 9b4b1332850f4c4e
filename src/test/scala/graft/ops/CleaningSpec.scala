package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The composed cleaning pipeline: the report must PARTITION the corpus
  * (every doc counted exactly once, under its first failing stage) and
  * agree with the underlying declared operators it composes. */
class CleaningSpec extends SparkSuite {

  test("reasons partition the corpus and stage counts agree with the operators") {
    val out = Cleaning.corpusCleanQ(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") >= 50)

    val reasons = out.select("reason").collect().map(_.getString(0)).toSet
    assert(reasons.subsetOf(
      Set("lang", "quality", "repetition", "duplicate", "contaminated", "keep")),
      reasons.toString)
    assert(out.agg(sum("n_docs")).head.getLong(0) == corpus.count(),
      "report does not partition the corpus")

    // first-stage counts agree with the operator computed directly
    val byReason = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nonEn = corpus.filter(col("lang") =!= "en").count()
    assert(byReason.getOrElse("lang", 0L) == nonEn)
    // quality rejections = en docs failing the quality keep flag
    val qFail = TextOps.qualityScores(corpus.filter(col("lang") === "en"))
      .filter(col("keep") === 0L).count()
    assert(byReason.getOrElse("quality", 0L) == qFail)
    out.unpersist()
  }

  test("html extraction: chrome/boilerplate dropped exactly, content " +
    "round-trips, and the extraction composes AHEAD of corpusClean " +
    "(the crawl-ingest order)") {
    import spark.implicits._
    // hand fixture: doc 35 gets BOTH the analytics script (%5) and the
    // tracking comment (%7); 16 tokens = two full 8-token paragraphs
    val toks16 = (1 to 16).map(i => s"word$i")
    val hand = Seq(
      (35L, toks16.mkString(" "), "en"),
      (36L, "", "en")).toDF("doc_id", "text", "lang")
    val got = Cleaning.htmlExtractQ(hand)
      .collect().map(r => r.getLong(0) -> r).toMap

    val r35 = got(35L)
    assert(r35.getAs[String]("text_extracted") == toks16.mkString(" "),
      "full paragraphs must round-trip verbatim")
    // non-empty lines: title ('doc 35', 2 words), nav, p1, p2, footer
    assert(r35.getAs[Long]("n_lines") == 5L)
    assert(r35.getAs[Long]("n_kept") == 2L,
      "title (<3 words), nav ('|') and footer ('copyright') are boilerplate")
    Seq("<", ">", "analytics", "var x", "copyright", "tracking")
      .foreach(frag => assert(!r35.getAs[String]("text_extracted")
        .contains(frag), s"chrome fragment '$frag' leaked"))
    val r36 = got(36L)
    assert(r36.getAs[Long]("n_kept") == 0L &&
      r36.getAs[String]("text_extracted") == "" &&
      r36.getAs[Long]("n_lines") == 3L,
      "empty doc keeps only the chrome lines, none survive")

    // round-trip law over the REAL fixture: any doc whose paragraph
    // tail has >= 3 words (or none) extracts back to its exact token
    // stream — extraction in front of the pipeline loses nothing but
    // declared boilerplate
    val docs = graft.sources.Tables.documents(spark, sf)
    val ext = Cleaning.htmlExtractQ(docs)
    val joined = docs
      .select(col("doc_id"),
        concat_ws(" ",
          filter(TextOps.toks(col("text")), t => t =!= "")).as("want"),
        (size(filter(TextOps.toks(col("text")), t => t =!= "")) % 8)
          .as("tail"))
      .join(ext.select(col("doc_id"), col("text_extracted")), "doc_id")
    val full = joined.filter(col("tail") === 0 || col("tail") >= 3)
    assert(full.count() > 0)
    assert(full.filter(col("want") =!= col("text_extracted")).count() == 0L,
      "extraction must recover the exact token stream when no tail chunk " +
        "falls under the min-words rule")

    // composition: extraction output feeds cleanVerdictsOf directly —
    // the crawl order (extract -> lang -> quality -> ... ) — and the
    // verdict frame still partitions the corpus
    val cleanedIn = ext
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("text_extracted").as("text"), col("lang"))
    val verdicts = Cleaning.cleanVerdictsOf(
      cleanedIn.filter(col("doc_id") < 50),
      cleanedIn.filter(col("doc_id") >= 50))
    val hist = verdicts.groupBy("reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist.values.sum == cleanedIn.filter(col("doc_id") >= 50).count(),
      "composed pipeline must still partition the corpus")
    assert(hist.getOrElse("keep", 0L) > 0L, "composition must keep docs")
    assert(hist.keySet.subsetOf(Set("lang", "quality", "repetition",
      "duplicate", "contaminated", "keep")))
  }

  test("e2e incremental: a survivable delta packs through the frozen " +
    "artifacts (every stage exercised incl. pack) and the delta pass " +
    "never reads the base documents source — the steady-state cost law") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val wA = (0 until 20).map(i => s"alpha$i")
    val wB = (0 until 20).map(i => s"bravo$i")
    // every doc: distinct tokens + one stopword (passes quality and
    // repetition); per-doc shuffled order so no 8-gram ever repeats
    // (substring excision is a deliberate no-op — enc-length reference
    // below stays independent of the excision path)
    def mk(words: Seq[String]): String = rnd.shuffle(words :+ "the").mkString(" ")
    val evalText = "the benchmark question answer pairs leak detection " +
      "test phrase appears verbatim here"
    val base = ((0 until 6).map(i => (100L + i, mk(wA), "en")) ++
      (0 until 6).map(i => (200L + i, mk(wB), "en")))
      .toDF("doc_id", "text", "lang")
    // 4 words from each quarter: J = 9/29 ≈ 0.31 against both base
    // families AND both keepers — survives every near-dup check
    val dupText = mk(wA.take(4) ++ wA.drop(10).take(4) ++
      wB.take(4) ++ wB.drop(10).take(4))
    val delta = Seq(
      (300L, mk(wA.take(10) ++ wB.take(10)), "en"), // keeper (J≈0.35 vs both families)
      (301L, mk(wA.drop(10) ++ wB.drop(10)), "en"), // keeper
      (302L, mk(wA), "en"),                         // near-dup of family A (J=1)
      (303L, mk(wA.take(12)), "fr"),                // lang
      (304L, "tiny doc", "en"),                     // quality
      (305L, dupText, "en"),                        // first copy: keeps (J<0.5 everywhere)
      (306L, dupText, "en"),                        // exact within-delta dup
      (307L, evalText, "en"))                       // contaminated
      .toDF("doc_id", "text", "lang")
    val evalDocs = Seq((1L, evalText, "en")).toDF("doc_id", "text", "lang")

    // parquet-backed frames so the no-rescan law is about real files
    val root = java.nio.file.Files.createTempDirectory("e2e_incr").toString
    base.write.parquet(s"$root/base"); delta.write.parquet(s"$root/delta")
    evalDocs.write.parquet(s"$root/eval")
    val baseP = spark.read.parquet(s"$root/base")
    val ndDir = s"$root/nd"; val gramDir = s"$root/gram"; val bpeDir = s"$root/bpe"
    Dedup.writeNearDupIndex(baseP.select("doc_id", "text"), ndDir)
    Dedup.writeSubstringIndex(baseP.select("doc_id", "text"), gramDir)
    Bpe.writeEncoder(baseP, bpeDir, k = 6)
    PipelineCaches.release(spark)

    val report = Cleaning.e2eCorpusIncrOf(
      spark.read.parquet(s"$root/eval"), spark.read.parquet(s"$root/delta"),
      ndDir, gramDir, bpeDir)
    val rows = report.collect()
    val drops = rows.filter(_.getString(0) == "drop")
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    val nChars = delta.collect().map(r => r.getLong(0) -> r.getString(1).length.toLong).toMap
    assert(drops.keySet ==
      Set("lang", "quality", "duplicate", "near_duplicate", "contaminated"))
    assert(drops("lang") == (1L, nChars(303L)))
    assert(drops("quality") == (1L, nChars(304L)))
    assert(drops("duplicate") == (1L, nChars(306L)), "higher id yields within-delta")
    assert(drops("near_duplicate") == (1L, nChars(302L)),
      "a delta doc near-dupping the base must yield to the shipped base")
    assert(drops("contaminated") == (1L, nChars(307L)))

    // pack tail: keepers 300/301/305 encode under the FROZEN encoder;
    // reference = a fresh in-memory train on the same base (persisted
    // artifact == fresh induction), summed over the keepers' raw text
    // (excision no-op by construction)
    val keepers = delta.filter(col("doc_id").isin(300L, 301L, 305L))
    val refLens = Bpe.encodedLengths(baseP, keepers, k = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refLens.keySet == Set(300L, 301L, 305L))
    val packs = rows.filter(_.getString(0) == "pack")
    assert(packs.map(_.getLong(2)).sum == 3L, "all three keepers pack")
    assert(packs.map(_.getLong(3)).sum == refLens.values.sum,
      "packed token total must equal the frozen-encoder lengths")
    packs.foreach(r => assert(r.getLong(4) >= 1L && !r.isNullAt(5)))

    // the steady-state law: the delta report's lineage reads the three
    // artifact dirs and the delta/eval sources — NEVER the base
    // documents files (delta cost is independent of how much corpus
    // the loop already shipped; the base text is reachable only
    // through its bounded index artifacts)
    PipelineCaches.release(spark)
    // collect from the ANALYZED plan (pre-cache-substitution): the
    // full file lineage of the report, nothing hidden under the
    // pipeline's tracked caches
    val files = Cleaning.e2eCorpusIncrOf(
      spark.read.parquet(s"$root/eval"), spark.read.parquet(s"$root/delta"),
      ndDir, gramDir, bpeDir)
      .queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
    assert(files.nonEmpty)
    assert(files.exists(_.contains("/nd")) && files.exists(_.contains("/gram"))
      && files.exists(_.contains("/bpe")), files.mkString("\n"))
    assert(!files.exists(_.contains("/base")),
      "the delta pass must never re-read the base documents source:\n" +
        files.mkString("\n"))
    PipelineCaches.release(spark)
  }

  test("shared per-row expressions match the standalone operator frames") {
    // the round-9 fusion computes the stage verdicts from
    // qualityKeepExpr / dupGramFrac in ONE pass — pin that they equal
    // the frames qualityScores / repetitionScores produce, doc by doc
    val docs = graft.sources.Tables.documents(spark, sf)
    val viaExpr = docs.select(col("doc_id"),
      TextOps.qualityKeepExpr(col("text")).as("k2"),
      TextOps.dupGramFrac(TextOps.toks(col("text")), 2).as("d2"),
      TextOps.dupGramFrac(TextOps.toks(col("text")), 3).as("d3"))
    val q = TextOps.qualityScores(docs).select(col("doc_id"), col("keep"))
    val r = TextOps.repetitionScores(docs)
      .select(col("doc_id"), col("dup_2gram_frac"), col("dup_3gram_frac"))
    val bad = viaExpr.join(q, "doc_id").join(r, "doc_id")
      .filter(col("k2") =!= col("keep") ||
        col("d2") =!= col("dup_2gram_frac") || col("d3") =!= col("dup_3gram_frac"))
      .count()
    assert(bad == 0, s"$bad docs diverge between expr and frame forms")
  }

  test("char totals are consistent with the per-reason doc sets") {
    val out = Cleaning.corpusCleanQ(spark, sf)
    val total = out.agg(sum("total_chars")).head.getLong(0)
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") >= 50)
      .agg(sum(length(col("text")))).head.getLong(0)
    assert(total == expected)
  }
}
