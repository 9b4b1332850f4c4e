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
}
