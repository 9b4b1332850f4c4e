package graft.ops

import graft.SparkSuite
import graft.sources.Tables

/** Reference replays + structural laws for sliding-window chunking and
  * URL canonicalization dedup. */
class ChunkUrlSpec extends SparkSuite {

  test("chunkQ matches a driver-side reference and covers every token") {
    val (window, stride) = (64, 48)
    val docs = Tables.documents(spark, sf)
    val want = docs.select("doc_id", "text").collect().flatMap { r =>
      val toks = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) Seq.empty
      else {
        val nChunks = 1 + math.ceil(math.max(toks.length - window, 0) / stride.toDouble).toInt
        (0 until nChunks).map { i =>
          (r.getLong(0), i.toLong) ->
            (math.min(window, toks.length - i * stride).toLong,
              toks.slice(i * stride, i * stride + window).mkString(" "))
        }
      }
    }.toMap
    val got = TextOps.chunkQ(docs, window, stride).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(got == want)
    // structural laws: dense chunk ids; all but the last chunk full;
    // the last chunk reaches the document's end
    got.keys.groupBy(_._1).foreach { case (doc, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.length).toSeq, s"doc $doc chunk ids not dense")
      ids.init.foreach(i => assert(got((doc, i))._1 == window, s"doc $doc chunk $i short"))
    }
  }

  test("chunkQ plan is map-side only (one Generate, no keyed shuffle)") {
    val plan = TextOps.chunkQ(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    // the only exchange allowed is fanout's round-robin repartition
    // (single-file-scan parallelism); chunking itself never shuffles
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(600))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(600))
    assert(plan.contains("Generate"), plan.take(600))
  }

  test("chunkQ with stride == window reconstructs the token stream exactly") {
    val docs = Tables.documents(spark, sf)
    val rebuilt = TextOps.chunkQ(docs, window = 32, stride = 32)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (doc, rows) =>
        doc -> rows.sortBy(_.getLong(1)).map(_.getString(3)).mkString(" ")
      }
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" "))
      .filter(_._2.nonEmpty).toMap
    assert(rebuilt == want)
  }

  test("urlDedup canonicalization: every rule fires; dup counts tile the corpus") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val rows = Dedup.urlDedupQ(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum == total, "dup counts must tile the corpus")
    rows.foreach { case (_, u, _) =>
      assert(u == u.toLowerCase, s"host not lowered: $u")
      assert(!u.contains("?") && !u.contains("#"), s"query/fragment kept: $u")
      assert(!u.endsWith("/"), s"trailing slash kept: $u")
      assert(!u.contains("//www."), s"www kept: $u")
      assert(u.startsWith("https://src"), s"unexpected shape: $u")
    }
    // the representative is the group minimum
    val docsById = rows.map(_._1)
    assert(docsById.distinct.length == docsById.length)
    // collision rule: docs sharing (source, doc_id % 40) collapse — so
    // there must be real dups at this corpus size
    assert(rows.exists(_._3 > 1), "fixture must exercise actual URL dups")
  }

  test("urlDedup: canonical variants of one URL actually collapse") {
    import spark.implicits._
    val variants = Seq(
      (1L, "https://example.com/a"),
      (2L, "HTTPS://EXAMPLE.COM/a/"),
      (3L, "https://www.example.com/a?utm=x"),
      (4L, "https://example.com/a#frag"),
      (5L, "https://example.com/b")).toDF("doc_id", "url")
    val out = Dedup.urlDedup(variants).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2))).toMap
    assert(out.keySet == Set("https://example.com/a", "https://example.com/b"))
    assert(out("https://example.com/a") == (1L, 4L))
    assert(out("https://example.com/b") == (5L, 1L))
  }

  test("urlDedup: schemeless/relative/malformed URLs pass through raw, never collapse") {
    import spark.implicits._
    val mixed = Seq(
      (1L, "example.com/a"),          // schemeless
      (2L, "/relative/path"),         // relative
      (3L, "not a url at all"),       // malformed
      (4L, "https://example.com/a"),  // schemed control
      (5L, "HTTPS://example.com/a/")).toDF("doc_id", "url")
    val out = Dedup.urlDedup(mixed).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2))).toMap
    // the three scheme-free rows keep their raw strings as three distinct
    // groups (the pre-guard behavior collapsed them all into canon "")
    assert(out.keySet == Set(
      "example.com/a", "/relative/path", "not a url at all",
      "https://example.com/a"))
    assert(out("example.com/a") == (1L, 1L))
    assert(out("/relative/path") == (2L, 1L))
    assert(out("not a url at all") == (3L, 1L))
    assert(out("https://example.com/a") == (4L, 2L))
  }
}
