package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The CacheAudit walker is round-9 evidence infrastructure (it cleared
  * all 98 queries of the q_pmi silent cache-miss class) — pin that it
  * actually counts what it claims: file scans reachable without
  * crossing an in-memory-cache boundary, through AQE wrappers. */
class CacheAuditSpec extends SparkSuite {

  test("uncached self-join shows two external scans; cached shows zero") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"))

    val self = docs.as("a").join(docs.as("b"), Seq("source"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    self.write.format("noop").mode("overwrite").save()
    val uncached = CacheAudit.externalScans(self.queryExecution.executedPlan)
    assert(uncached.size == 2,
      s"self-join of raw parquet must surface both scans, got ${uncached.size}")

    val cached = docs.cache()
    try {
      cached.count()
      val joined = cached.as("a").join(cached.as("b"), Seq("source"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      joined.write.format("noop").mode("overwrite").save()
      val ext = CacheAudit.externalScans(joined.queryExecution.executedPlan)
      assert(ext.isEmpty,
        s"both sides must read the cache - external scans: ${ext.size}")
    } finally { cached.unpersist(); () }
  }
}
