package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Persisted minhash index: the incremental (delta-vs-corpus) dedup
  * path must agree exactly with the batch all-pairs operator. */
class NearDupIndexSpec extends SparkSuite {

  test("delta-vs-index pairs equal batch pairs restricted to cross pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("neardup_idx").toString
    Dedup.writeNearDupIndex(docs, dir)
    // the delta: every corpus text re-ingested under a fresh id — each
    // delta doc must rediscover its source as an exact duplicate
    val delta = docs.select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val q = Dedup.nearDupsAgainstIndex(spark, delta, dir)
    // the index side must stream through broadcast-hash joins (the delta
    // is the broadcast side) — an index-side sort or exchange before the
    // band join would mean the corpus scan is being shuffled
    assert(q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "delta bands must broadcast against the streamed index scan")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val nDocs = docs.count()
    assert(got.count { case (a, b, j) => a - 10000L == b && j == 1.0 } == nDocs,
      "every delta doc must match its identical source with jaccard 1")
    // full parity with the batch operator over the union, restricted to
    // (indexed, new) cross pairs — same bands, same hashes, same verify
    val batch = Dedup.nearDupPairs(docs.select("doc_id", "text").unionByName(delta)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < 10000L && b >= 10000L }
      .map { case (a, b, j) => (b, a, j) }.toSet
    assert(got == batch,
      s"index query must equal batch cross pairs (got=${got.size} batch=${batch.size})")
  }
}
