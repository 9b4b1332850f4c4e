package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Crash-consistency fault injection for the seven-index maintenance
  * loop (round-11 hardening): kill each family's compaction in the
  * window BETWEEN its data write and the DirSwap delete+rename (the
  * `crashBeforeSwap` failpoint) and assert
  *   1. readers keep seeing the OLD generation bit-for-bit,
  *   2. a retried compaction converges (DirSwap clears the stale temp
  *      first) and the reader output is STILL unchanged.
  * A second injection mode kills MID-WRITE (the writer throws with a
  * partial temp on disk) — same two laws. The append-side crash
  * ordering (span meta marked stale BEFORE data moves) gets its own
  * state-constructed pin. */
class FaultInjectionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def docText(i: Long) =
    s"seed token$i alpha beta gamma delta common tail v${i % 3}"
  private def docsDF(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, docText(i))).toDF("doc_id", "text")
  private def embOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("vec_id"),
      transform(sequence(lit(0), lit(3)),
        i => (pmod(hash(col("text"), i), lit(997)).cast("double") / 498.5 - 1.0))
        .cast("array<float>").as("embedding"))
  private def liOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("l_orderkey"), lit(1).as("l_linenumber"),
      size(split(col("text"), " ")).cast("double").as("l_quantity"),
      length(col("text")).cast("double").as("l_extendedprice"),
      timestamp_micros(col("doc_id") * 86400000000L).as("l_shipdate"),
      substring(col("text"), 1, 1).as("l_returnflag"),
      lit("O").as("l_linestatus"))

  private def rows(df: DataFrame): Set[Row] = {
    val out = df.collect().toSet
    PipelineCaches.release(spark)
    out
  }

  private case class Killed() extends RuntimeException("injected crash")

  /** The shared drill: snapshot the reader, kill a compaction before
    * its swap, assert old generation + converging retry. */
  private def drill(name: String, reader: () => DataFrame,
      compact: () => Unit): Unit = {
    val before = rows(reader())
    DirSwap.crashBeforeSwap = Some(_ => throw Killed())
    try {
      intercept[Killed](compact())
    } finally DirSwap.crashBeforeSwap = None
    assert(rows(reader()) == before,
      s"$name: reader must see the OLD generation after a pre-swap crash")
    compact() // retry must clear the stale temp and converge
    assert(rows(reader()) == before,
      s"$name: reader output must survive the retried compaction")
  }

  test("near-dup index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_near")
    Dedup.writeNearDupIndex(docsDF(1L to 30L), dir)
    Dedup.appendToNearDupIndex(docsDF(31L to 40L), dir)
    val delta = docsDF(Seq(900L)).withColumn("text", lit(docText(7L)))
    drill("near-dup",
      () => Dedup.nearDupsAgainstIndex(spark, delta, dir),
      () => Dedup.compactNearDupIndex(spark, dir))
  }

  test("winnow index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_win")
    Dedup.writeWinnowIndex(docsDF(1L to 30L), dir)
    val delta = docsDF(Seq(900L)).withColumn("text", lit(docText(7L)))
    drill("winnow",
      () => Dedup.winnowAgainstIndex(spark, delta, dir),
      () => Dedup.compactWinnowIndex(spark, dir))
  }

  test("span index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_span")
    Dedup.writeSpanIndex(docsDF(1L to 30L), dir, w = 4)
    Dedup.appendToSpanIndex(docsDF(31L to 40L), dir)
    val delta = docsDF(Seq(900L)).withColumn("text", lit(docText(7L)))
    drill("span",
      () => Dedup.spanDedupAgainstIndex(spark, delta, dir),
      () => Dedup.compactSpanIndex(spark, dir))
  }

  test("gram (substring) index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_gram")
    Dedup.writeSubstringIndex(docsDF(1L to 30L), dir, minLen = 4)
    Dedup.appendToSubstringIndex(docsDF(31L to 40L), dir)
    val delta = docsDF(Seq(900L)).withColumn("text", lit(docText(7L)))
    drill("gram",
      () => Dedup.substringDedupAgainstIndex(spark, delta, dir),
      () => Dedup.compactSubstringIndex(spark, dir))
  }

  test("IVF index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_ivf")
    SimSearch.writeIvfIndex(embOf(docsDF(1L to 30L)), dir,
      nCells = 4, centroidFrom = 0)
    val probes = embOf(docsDF(Seq(900L)))
      .select(col("vec_id").as("probe_id"), col("embedding"))
    drill("ivf",
      () => SimSearch.ivfTopKFromIndex(spark, dir, probes, k = 3),
      () => SimSearch.compactIvfIndex(spark, dir))
  }

  test("image (dHash band) index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_img")
    MultiModal.writeImageIndex(MultiModal.withPayload(docsDF(1L to 30L)), dir)
    MultiModal.appendToImageIndex(MultiModal.withPayload(docsDF(31L to 40L)), dir)
    val delta = MultiModal.withPayload(
      docsDF(Seq(900L)).withColumn("text", lit(docText(7L))))
    drill("image",
      () => MultiModal.imageNearDupsAgainstIndex(spark, delta, dir),
      () => MultiModal.compactImageIndex(spark, dir))
  }

  test("audio (chroma fp) index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_aud")
    // longer payloads so every doc carries several window fingerprints
    def audText(i: Long) = (docText(i) + " ") * 5
    def audDocs(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, audText(i))).toDF("doc_id", "text")
    MultiModal.writeAudioIndex(audDocs(1L to 30L), dir)
    MultiModal.appendToAudioIndex(audDocs(31L to 40L), dir)
    val delta = Seq((900L, audText(7L).updated(100, '~'))).toDF("doc_id", "text")
    drill("audio",
      () => MultiModal.audioNearDupsAgainstIndex(spark, delta, dir),
      () => MultiModal.compactAudioIndex(spark, dir))
  }

  test("profile index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_prof")
    ProfileIndex.writeProfileSketches(liOf(docsDF(1L to 30L)), dir)
    ProfileIndex.appendProfileSketches(liOf(docsDF(31L to 40L)), dir)
    drill("profile",
      () => ProfileIndex.profileFromSketches(spark, dir),
      () => ProfileIndex.compactProfileSketches(spark, dir))
  }

  test("text (BM25 postings) index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_text")
    TextIndex.writeTextIndex(docsDF(1L to 30L), dir)
    TextIndex.appendToTextIndex(docsDF(31L to 40L), dir)
    drill("text",
      () => TextIndex.bm25FromIndex(spark, dir, Seq("alpha", "token7", "v1")),
      () => TextIndex.compactTextIndex(spark, dir))
  }

  test("CMS index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_cms")
    CmsIndex.writeCmsIndex(docsDF(1L to 30L), dir)
    CmsIndex.appendToCmsIndex(docsDF(31L to 40L), dir)
    drill("cms",
      () => CmsIndex.estimatesFromIndex(spark, dir, Seq("alpha", "token7", "v1")),
      () => CmsIndex.compactCmsIndex(spark, dir))
  }

  test("quantile index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_quant")
    val li = graft.sources.Tables.lineitem(spark, sf)
    QuantileIndex.writeQuantileIndex(li.filter(col("l_orderkey") % 2 === 0), dir)
    QuantileIndex.appendToQuantileIndex(li.filter(col("l_orderkey") % 2 =!= 0), dir)
    drill("quantile",
      () => QuantileIndex.quantilesFromIndex(spark, dir),
      () => QuantileIndex.compactQuantileIndex(spark, dir))
  }

  test("edge index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_edge")
    val ev = graft.sources.Tables.events(spark, sf)
    EdgeIndex.writeEdgeIndex(ev.filter(col("user_id") % 2 === 0), dir)
    EdgeIndex.appendToEdgeIndex(ev.filter(col("user_id") % 2 =!= 0), dir)
    drill("edge",
      () => EdgeIndex.edgesFromIndex(spark, dir),
      () => EdgeIndex.compactEdgeIndex(spark, dir))
  }

  test("LM index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_lm")
    val d = docsDF(1L to 30L).withColumn("lang", lit("en"))
    LmIndex.writeLmIndex(d, dir)
    LmIndex.appendToLmIndex(
      docsDF(31L to 40L).withColumn("lang", lit("en")), dir)
    drill("lm",
      () => LmIndex.scoreFromIndex(spark, dir,
        docsDF(Seq(900L)).withColumn("lang", lit("en"))),
      () => LmIndex.compactLmIndex(spark, dir))
  }

  test("phrase index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_phrase")
    PhraseIndex.writePhraseIndex(docsDF(1L to 30L), dir)
    PhraseIndex.appendToPhraseIndex(docsDF(31L to 40L), dir)
    drill("phrase",
      () => PhraseIndex.phrasesFromIndex(spark, dir,
        Seq("alpha beta gamma", "common tail")),
      () => PhraseIndex.compactPhraseIndex(spark, dir))
  }

  test("mid-write crash (partial temp on disk): live untouched, retry converges") {
    val dir = tmp("fi_partial")
    Dedup.writeNearDupIndex(docsDF(1L to 30L), dir)
    val delta = docsDF(Seq(900L)).withColumn("text", lit(docText(7L)))
    val before = rows(Dedup.nearDupsAgainstIndex(spark, delta, dir))
    // the writer dies after materializing PART of the temp output —
    // exactly what a mid-write executor loss leaves behind
    intercept[Killed] {
      DirSwap(spark, s"$dir/bands") { out =>
        spark.range(3).toDF("junk").write.parquet(s"$out/partial")
        throw Killed()
      }
    }
    assert(rows(Dedup.nearDupsAgainstIndex(spark, delta, dir)) == before,
      "live index must be untouched by a mid-write crash")
    Dedup.compactNearDupIndex(spark, dir)
    assert(rows(Dedup.nearDupsAgainstIndex(spark, delta, dir)) == before,
      "retried compaction must clear the partial temp and converge")
  }

  test("entity index: compaction killed before swap -> old generation; retry converges") {
    val dir = tmp("fi_ent")
    EntityIndex.writeEntityIndex(docsDF(1L to 30L), dir)
    EntityIndex.appendToEntityIndex(docsDF(31L to 40L), dir)
    drill("entity",
      () => EntityIndex.inventoryFromIndex(spark, dir),
      () => EntityIndex.compactEntityIndex(spark, dir))
  }

  test("forget crash window: a kill between the purge rewrite and the " +
    "tombstone clear leaves reads correct (self-healing)") {
    // compactTextIndex purges via two DirSwaps THEN clears tombstones;
    // a crash after the swaps but before the clear leaves purged data
    // + a lingering tombstone table. The anti-join over already-purged
    // rows is a no-op, so reads stay exactly right, and the next
    // compaction retires the tombstones.
    val docs = docsDF(1L to 30L)
    val dir = tmp("fi_forget")
    TextIndex.writeTextIndex(docs, dir)
    TextIndex.forgetFromTextIndex(spark, dir,
      docs.filter(col("doc_id") % 5 === 0).select("doc_id"))
    val want = rows(TextIndex.bm25FromIndex(spark, dir,
      Seq("alpha", "token7", "v1")))
    TextIndex.compactTextIndex(spark, dir)
    // reconstruct the crash state: purged tables + re-created tombstones
    import spark.implicits._
    Tombstones.append(dir, (1L to 30L).filter(_ % 5 == 0).toDF("doc_id"))
    assert(rows(TextIndex.bm25FromIndex(spark, dir,
      Seq("alpha", "token7", "v1"))) == want,
      "lingering tombstones over purged data must read identically")
    TextIndex.compactTextIndex(spark, dir)
    assert(Tombstones.read(spark, dir).isEmpty,
      "the retry compaction retires the lingering tombstones")
    assert(rows(TextIndex.bm25FromIndex(spark, dir,
      Seq("alpha", "token7", "v1"))) == want)
  }

  test("forget request-time crash window: a kill before the tombstone " +
    "append commits NOTHING; the retry lands the full request once") {
    // The forget request's single commit point is the tombstone append
    // (the stats correction rides ON the appended rows — round-14
    // redesign after the r13 ADVICE found the old two-append sequence
    // could double-subtract on retry). Kill right before the append:
    // reads must be bit-identical to pre-request, and the retried
    // request must equal the survivor-corpus scorer with no residue of
    // the crashed attempt.
    val docs = docsDF(1L to 30L)
    val dir = tmp("fi_forget_req")
    TextIndex.writeTextIndex(docs, dir)
    val terms = Seq("alpha", "token7", "v1")
    val before = rows(TextIndex.bm25FromIndex(spark, dir, terms))
    val victims = docs.filter(col("doc_id") % 5 === 0).select("doc_id")
    Tombstones.crashBeforeAppend = Some(_ => throw Killed())
    try {
      intercept[Killed](TextIndex.forgetFromTextIndex(spark, dir, victims))
    } finally Tombstones.crashBeforeAppend = None
    assert(rows(TextIndex.bm25FromIndex(spark, dir, terms)) == before,
      "a crashed forget request must commit nothing")
    TextIndex.forgetFromTextIndex(spark, dir, victims)
    val want = rows(Scoring.bm25Q(
      docsDF((1L to 30L).filterNot(_ % 5 == 0)), terms))
    assert(rows(TextIndex.bm25FromIndex(spark, dir, terms)) == want,
      "the retried request must land exactly once (no double correction)")
  }

  test("concurrent reader vs compaction (BM25): a reader that resolved and " +
    "listed the pre-compaction generation completes on it consistently; " +
    "the next generation retires it only one full cycle later") {
    // The round-16 VERDICT's one correctness-at-scale hole: under the
    // old delete+rename swap, a reader that listed files pre-swap and
    // fetched post-delete hit FileNotFound mid-query. The generation
    // swap closes it: spark.read.parquet resolves AND lists the
    // physical generation at DataFrame construction, so building the
    // frame here and collecting it only AFTER the compaction is
    // exactly the listed-pre-swap / fetched-post-swap interleaving,
    // made deterministic.
    val dir = tmp("fi_reader_text")
    TextIndex.writeTextIndex(docsDF(1L to 30L), dir)
    TextIndex.appendToTextIndex(docsDF(31L to 40L), dir)
    val terms = Seq("alpha", "token7", "v1")
    val before = rows(TextIndex.bm25FromIndex(spark, dir, terms))
    val pinned1 = TextIndex.bm25FromIndex(spark, dir, terms) // pins gen 0
    TextIndex.compactTextIndex(spark, dir)                   // commits gen 1
    assert(rows(pinned1) == before,
      "reader pinned on the pre-compaction generation must complete on it")
    val pinned2 = TextIndex.bm25FromIndex(spark, dir, terms) // pins gen 1
    TextIndex.compactTextIndex(spark, dir)                   // commits gen 2, retires gen 0
    assert(rows(pinned2) == before,
      "one full compaction cycle of grace: a reader pinned on gen N " +
        "survives the commit of gen N+1")
    assert(rows(TextIndex.bm25FromIndex(spark, dir, terms)) == before,
      "fresh readers resolve the newest committed generation")
  }

  test("concurrent reader vs compaction (LM ledger family): pinned read " +
    "completes across a purge compaction; fresh reads see the purged store") {
    val dir = tmp("fi_reader_lm")
    val d = docsDF(1L to 30L).withColumn("lang", lit("en"))
    LmIndex.writeLmIndex(d, dir)
    LmIndex.appendToLmIndex(docsDF(31L to 40L).withColumn("lang", lit("en")), dir)
    LmIndex.forgetFromLmIndex(spark, dir,
      docsDF(Seq(5L, 10L)).withColumn("lang", lit("en")))
    val probe = docsDF(Seq(900L)).withColumn("lang", lit("en"))
    val before = rows(LmIndex.scoreFromIndex(spark, dir, probe))
    val pinned = LmIndex.scoreFromIndex(spark, dir, probe) // pins gen 0 + its in-dir ledger
    LmIndex.compactLmIndex(spark, dir) // purge: bakes corrections, commits gen 1
    assert(rows(pinned) == before,
      "a reader pinned on the pre-purge generation reads counts AND " +
        "ledger from ONE generation — netted exactly as before")
    assert(rows(LmIndex.scoreFromIndex(spark, dir, probe)) == before,
      "the purged generation must answer identically (erasure is " +
        "invisible to readers)")
  }

  test("concurrent reader vs compaction (latch): a scan BLOCKED mid-read " +
    "while the compaction commits the next generation still completes " +
    "on the generation it listed") {
    val dir = tmp("fi_reader_latch")
    TextIndex.writeTextIndex(docsDF(1L to 30L), dir)
    TextIndex.appendToTextIndex(docsDF(31L to 40L), dir)
    val postings = graft.ops.DirSwap.resolve(spark, s"$dir/postings")
    val want = spark.read.parquet(postings).count()
    FiGate.open = false
    val gate = org.apache.spark.sql.functions.udf { (_: Long) =>
      while (!FiGate.open) Thread.sleep(5)
      true
    }
    // files LISTED here (spark.read.parquet builds the file index
    // eagerly), BEFORE the compaction; coalesce(1) keeps the scan to
    // ONE task so the concurrent compaction's jobs still get slots
    // (local[4] would otherwise starve and the drill would deadlock)
    val df = spark.read.parquet(postings).coalesce(1)
      .filter(gate(col("doc_id")))
    val fut = scala.concurrent.Future {
      df.count()
    }(scala.concurrent.ExecutionContext.global)
    // barrier: wait until the scan task is RUNNING (spinning on the
    // gate) so the compaction is genuinely mid-read
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.sparkContext.statusTracker.getActiveStageIds.isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(10)
    assert(spark.sparkContext.statusTracker.getActiveStageIds.nonEmpty,
      "scan task never started")
    // compact while the read is in flight, then release the gate: the
    // blocked task fetches files listed BEFORE the swap — the exact
    // window the old delete+rename broke
    TextIndex.compactTextIndex(spark, dir)
    FiGate.open = true
    val got = scala.concurrent.Await.result(fut,
      scala.concurrent.duration.Duration(120, "s"))
    assert(got == want,
      "mid-read compaction must not disturb the in-flight scan")
  }

  test("span append crash ordering: stale meta marker + old data reads correctly") {
    // appendToSpanIndex marks n_frequent stale BEFORE moving data; a
    // crash between the two writes leaves (stale meta, old data).
    // Construct that exact state and assert the reader's eager-count
    // fallback returns the same verdicts as the fresh-meta index.
    val dir = tmp("fi_stale")
    Dedup.writeSpanIndex(docsDF(1L to 30L), dir, w = 4)
    val delta = docsDF(Seq(900L)).withColumn("text", lit(docText(7L)))
    val fresh = rows(Dedup.spanDedupAgainstIndex(spark, delta, dir))
    Dedup.markSpanMetaStaleTestSeam(spark, dir)
    assert(rows(Dedup.spanDedupAgainstIndex(spark, delta, dir)) == fresh,
      "stale-marker state must read identically via the eager-count fallback")
    // compaction restores the fresh marker; reader unchanged
    Dedup.compactSpanIndex(spark, dir)
    assert(rows(Dedup.spanDedupAgainstIndex(spark, delta, dir)) == fresh)
  }
  test("Tombstones.minus resolves the DELETES table before the data " +
    "dir (round-17 ADVICE): a tombstone appended while the by-name " +
    "rows argument evaluates is not yet visible — the deletes snapshot " +
    "precedes the data resolve, so a compaction committing in the gap " +
    "can only produce the consistent (old-deletes/any-data) pairing") {
    val dir = tmp("ts_order")
    Seq(1L, 2L, 3L).toDF("doc_id").write.parquet(s"$dir/rows")
    Tombstones.append(dir, Tombstones.fresh(spark, dir, Seq(1L).toDF("doc_id")))
    val out = Tombstones.minus(spark, dir, {
      // lands between the deletes snapshot and the data read — the
      // mid-read forget must NOT leak into this read's anti-join
      Tombstones.append(dir,
        Tombstones.fresh(spark, dir, Seq(2L).toDF("doc_id")))
      spark.read.parquet(s"$dir/rows")
    })
    assert(out.collect().map(_.getLong(0)).toSet == Set(2L, 3L),
      "victim 1 (snapshotted) excluded; victim 2 (mid-read) not yet")
  }

  test("Tombstones.clear is a no-op on an absent AND on an already-" +
    "cleared table (round-17 ADVICE: a steady maintenance loop must " +
    "not grow generation numbers or churn the FS per cycle)") {
    val dir = tmp("ts_clear")
    Tombstones.clear(spark, dir) // never created: nothing appears
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/deletes")))
    assert(DirSwap.resolve(spark, s"$dir/deletes") == s"$dir/deletes")
    Tombstones.append(dir, Tombstones.fresh(spark, dir, Seq(9L).toDF("doc_id")))
    Tombstones.clear(spark, dir)
    val gen1 = DirSwap.resolve(spark, s"$dir/deletes")
    assert(gen1 != s"$dir/deletes", "first clear commits an empty generation")
    Tombstones.clear(spark, dir)
    Tombstones.clear(spark, dir)
    assert(DirSwap.resolve(spark, s"$dir/deletes") == gen1,
      "repeat clears of an empty table must commit nothing")
  }
}

/** Volatile gate for the latch drill — a plain object so the udf
  * closure references the module statically (local mode, one JVM). */
private object FiGate {
  @volatile var open = false

}
