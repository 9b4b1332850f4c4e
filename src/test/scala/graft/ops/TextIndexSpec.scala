package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws for the ninth persisted index (inverted postings + BM25 read):
  * append-split invariance against the batch scorer, compaction
  * parity and layout, bucket-pruned retrieval reads, and edge
  * populations (whitespace docs, absent terms). The crash drill lives
  * in FaultInjectionSpec with the other eight; the composed ingestion
  * loop in IngestionMaintenanceSpec. */
class TextIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def rows(df: DataFrame): Set[Row] = df.collect().toSet

  test("index read == batch BM25, under any append split; whitespace docs out of N") {
    val docs = graft.sources.Tables.documents(spark, sf)
      // a whitespace-only doc must not join the scored population (it
      // has no tokens) NOR shift N/avgdl — same rule as the batch form
      .unionByName(Seq((9000L, "   \t  ", "xx", "srcX", 6L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val batch = rows(Scoring.bm25Q(docs))
    assert(batch.nonEmpty, "fixture must match at least one query term")

    // split 1: everything in the initial build
    val d1 = tmp("ti_all")
    TextIndex.writeTextIndex(docs, d1)
    assert(rows(TextIndex.bm25FromIndex(spark, d1)) == batch)

    // split 2: build on evens, append odds — same scores
    val d2 = tmp("ti_split")
    TextIndex.writeTextIndex(docs.filter(col("doc_id") % 2 === 0), d2)
    TextIndex.appendToTextIndex(docs.filter(col("doc_id") % 2 =!= 0), d2)
    assert(rows(TextIndex.bm25FromIndex(spark, d2)) == batch,
      "append split must not change a single score")

    // compaction: same scores, one file per touched bucket
    TextIndex.compactTextIndex(spark, d2)
    assert(rows(TextIndex.bm25FromIndex(spark, d2)) == batch,
      "compaction must not change a single score")
    val bktDirs = physicalDir(s"$d2/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
    assert(bktDirs.nonEmpty)
    bktDirs.foreach { bd =>
      val parts = bd.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts == 1, s"${bd.getName} has $parts files after compaction")
    }
  }

  test("retrieval read prunes to the query terms' buckets") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val dir = tmp("ti_prune")
    TextIndex.writeTextIndex(docs, dir)
    val q = TextIndex.bm25FromIndex(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("bkt"),
      "postings scan must carry a bkt partition filter:\n" + plan.take(700))
    // the token residual is pushed into the scan too
    assert(plan.contains("PushedFilters:") && plan.contains("token"),
      "token filter must push into the postings scan:\n" + plan.take(700))
    // and the model-sized sides broadcast — no shuffle join anywhere
    assert(!plan.contains("SortMergeJoin"), plan.take(700))
  }

  test("absent query terms score nothing and break nothing") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha")).toDF("doc_id", "text")
    val dir = tmp("ti_absent")
    TextIndex.writeTextIndex(docs, dir)
    assert(TextIndex.bm25FromIndex(spark, dir, Seq("nosuchterm")).isEmpty)
    // one present + one absent term: df reflects only the present one
    val got = TextIndex.bm25FromIndex(spark, dir, Seq("beta", "nosuchterm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("forget: tombstone read == batch over survivors; purge erases " +
    "physically; idempotent; boolean read honors tombstones") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val victims = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
    val survivors = docs.filter(col("doc_id") % 7 =!= 0)
    val want = rows(Scoring.bm25Q(survivors))

    val dir = tmp("ti_forget")
    TextIndex.writeTextIndex(docs, dir)
    TextIndex.forgetFromTextIndex(spark, dir, victims)
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) == want,
      "tombstone read must equal the batch scorer over survivors")
    val bs = rows(TextIndex.boolSearchFromIndex(spark, dir))
    assert(bs.nonEmpty && bs.forall(_.getLong(0) % 7 != 0L),
      "boolean read must never surface a forgotten doc")

    // double-forget: no duplicate tombstones, no double stats
    // subtraction — the read is unchanged
    TextIndex.forgetFromTextIndex(spark, dir, victims)
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) == want,
      "re-forgetting the same ids must be a no-op")
    // forgetting an id the index never saw: harmless
    TextIndex.forgetFromTextIndex(spark, dir,
      Seq(987654321L).toDF("doc_id"))
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) == want)

    // purge: same answer, victims physically absent, tombstones gone
    TextIndex.compactTextIndex(spark, dir)
    assert(rows(TextIndex.bm25FromIndex(spark, dir)) == want,
      "post-purge read must be indistinguishable")
    assert(Tombstones.read(spark, dir).isEmpty,
      "purge must clear the tombstone table")
    val residue = spark.read.parquet(physicalDir(s"$dir/postings").getPath)
      .filter(col("doc_id") % 7 === 0).count()
    assert(residue == 0L, "purge must physically erase the victims' rows")
    // stats collapsed to one exact row: N == survivor docs with tokens
    val st = spark.read.parquet(physicalDir(s"$dir/stats").getPath).collect()
    assert(st.length == 1)
    val expectedN = survivors
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("tk"))
      .select(explode(col("tk")).as("t"), col("doc_id"))
      .filter(col("t") =!= "").select("doc_id").distinct().count()
    assert(st.head.getLong(0) == expectedN,
      "negative partials must leave N exactly at the survivor count")
  }
}
