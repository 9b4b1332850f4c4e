package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws for the round-5 bloom-join and PII-redaction operators. */
class BloomRedactSpec extends SparkSuite {

  test("bloom-pruned join equals the plain filtered join; predicate reaches the fact side") {
    val q = BloomJoin.bloomJoinQ(spark, sf)
    val plain = spark.sql("""
      SELECT o_orderpriority, sum(l_quantity) AS total_qty, count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_orderpriority""")
    val got = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val exp = plain.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == exp)
    assert(got.nonEmpty)
    // the bloom predicate must survive into the physical plan (pushed to
    // the fact scan side, not optimized away)
    val plan = q.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
      "bloom predicate missing from plan:\n" + plan.take(800))
  }

  test("bloom decontamination == plain contamination; bloom predicate precedes the exact join") {
    val docs = graft.sources.Tables.documents(spark, sf)
    def toSet(df: org.apache.spark.sql.DataFrame) = {
      val out = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e12))).toSet
      PipelineCaches.release(spark)
      out
    }
    val plain = toSet(Dedup.contaminationQ(docs))
    val bloom = Dedup.contaminationBloomQ(docs)
    assert(toSet(bloom) == plain, "the bloom must be invisible in the result")
    assert(plain.nonEmpty, "spec needs a non-trivial contamination set")
    val plan = bloom.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
      "bloom predicate missing from plan:\n" + plan.take(800))
  }

  test("exact-k sample: exactly k per stratum, deterministic, stable under repartition") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val k = 7
    val got = Sampling.sampleExactKQ(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val perLang = got.groupBy(_._1).view.mapValues(_.size).toMap
    val counts = docs.filter(col("lang").isNotNull)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(k, n).toInt,
        s"stratum $lang must yield exactly min(k, |stratum|)")
    }
    // determinism under a different physical layout: same sample
    val re = Sampling.sampleExactKQ(
      docs.repartition(7, col("doc_id")), k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == got, "the sample is a property of the data, not the run")
    // scale shape: bounded-buffer aggregate, not a rank-filter window
    val plan = Sampling.sampleExactKQ(docs, k)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      "exact-k must ride the bounded-buffer aggregate, not a window")
    assert(plan.contains("ObjectHashAggregate"), plan.take(600))
  }

  test("snapshot diff classifies every id, and statuses follow the fixture arithmetic") {
    val out = Relational.snapshotDiffQ(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      val want =
        if (id % 17 == 3) "removed"
        else if (id % 17 == 5) "changed"
        else "unchanged"
      assert(out(id) == want, s"doc $id")
      if (id % 17 == 7)
        assert(out(id + 300000L) == "added", s"new page for $id")
    }
    assert(out.size == ids.length + ids.count(_ % 17 == 7),
      "every snapshot id classified exactly once")
  }

  test("redaction: each pattern fires, counts match, and redaction is idempotent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@x-y.co now ip 10.2.0.14 id 123456789 phone 555-867-5309 end"),
      (2L, "two mails p@q.io r@s.org and short num 1234"),
      (3L, "clean text only"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.redactPii(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) ==
      "mail <EMAIL> now ip <IP> id <ID> phone <PHONE> end")
    assert((out(1L).getLong(2), out(1L).getLong(3), out(1L).getLong(4), out(1L).getLong(5))
      == ((1L, 1L, 1L, 1L)))
    assert(out(2L).getString(1) == "two mails <EMAIL> <EMAIL> and short num 1234")
    assert(out(2L).getLong(2) == 2L)
    assert(out(3L).getString(1) == "clean text only")
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(2))
    // idempotence: placeholders contain no digits or @, so a second pass
    // is a no-op — redacted output is safe to re-scrub
    val once = TextOps.redactPii(docs)
    val twice = TextOps.redactPii(once.select(col("doc_id"), col("text")))
    assert(twice.select("doc_id", "text").collect().map(_.toString).sorted
      sameElements once.select("doc_id", "text").collect().map(_.toString).sorted)
  }

  test("dp release: exact driver replay of the seeded Laplace mechanism; " +
    "noise is nonzero and sensitivity-scaled") {
    val docsT = graft.sources.Tables.documents(spark, sf)
    val truth = docsT.filter(col("lang").isNotNull)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def md60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def lap(lang: String, eps: Double): Double = {
      val uu = ((md60(s"dp:r13:$lang") % 1000000L).toDouble + 0.5) / 1000000.0
      (if (uu >= 0.5) -1.0 else 1.0) * math.log(1.0 - 2.0 * math.abs(uu - 0.5)) / eps
    }
    val got = Sampling.dpReleaseQ(docsT).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (lang, rel) =>
      val want = BigDecimal(truth(lang) + lap(lang, 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rel - want) < 2e-6, s"$lang: $rel vs $want")
      assert(rel != truth(lang).toDouble, s"$lang released the true count")
    }
    // sensitivity scaling: a tighter budget means MORE noise, same signs
    val loose = got
    val tight = Sampling.dpReleaseQ(docsT, epsilon = 0.1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    tight.foreach { case (lang, rel) =>
      val (nl, nt) = (loose(lang) - truth(lang), rel - truth(lang))
      assert(math.abs(nt) > math.abs(nl), s"$lang: eps=0.1 must be noisier")
      assert(nl.sign == nt.sign, s"$lang: same seed, same direction")
    }
  }

  test("entity inventory: shared identifiers counted corpus-wide, " +
    "per-doc identifiers stay n_docs = 1; one corpus scan") {
    val docsT = graft.sources.Tables.documents(spark, sf)
    val nDocs = docsT.count()
    val q = TextOps.entitiesQ(docsT)
    // ONE scan: all four patterns extract inside a single projection
    val scans = q.queryExecution.executedPlan.toString
      .split('\n').count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected one corpus scan, saw $scans")
    val rows = q.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the synthesized footer phone is in EVERY doc — the cross-corpus
    // identifier the inventory exists to surface
    val phone = rows.filter(_._1 == "phone")
    assert(phone.length == 1 && phone.head._2 == "555-867-5309" &&
      phone.head._3 == nDocs && phone.head._4 == nDocs)
    // per-doc emails are unique by construction
    val emails = rows.filter(_._1 == "email")
    assert(emails.length.toLong == nDocs && emails.forall(_._3 == 1L))
    // id entities: doc_id + 1e8, one per doc
    assert(rows.filter(_._1 == "id").forall(e => e._3 == 1L && e._4 == 1L))
    // ips collide on the (doc_id % 256, (doc_id*7) % 256) grid:
    // occurrences conserve the corpus count
    assert(rows.filter(_._1 == "ip").map(_._4).sum == nDocs)
  }
}
