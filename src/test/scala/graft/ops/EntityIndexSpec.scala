package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** The sixteenth persisted index (typed-entity inventory): append-split
  * invariance, pruned lookup plan, forget integration, and the composed
  * governance loop — discover via lookup, then forget the discovered
  * docs in ANOTHER index. */
class EntityIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def docsT = Tables.documents(spark, sf)

  test("inventory fold == batch entitiesQ under any append split; " +
    "compaction preserves it and collapses files") {
    val want = TextOps.entitiesQ(docsT).collect().map(_.toString).sorted.toSeq
    val dir = tmp("ent_idx")
    EntityIndex.writeEntityIndex(docsT.filter(col("doc_id") % 3 === 0), dir)
    EntityIndex.appendToEntityIndex(docsT.filter(col("doc_id") % 3 === 1), dir)
    EntityIndex.appendToEntityIndex(docsT.filter(col("doc_id") % 3 === 2), dir)
    def inv() = EntityIndex.inventoryFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(inv() == want && want.nonEmpty)
    EntityIndex.compactEntityIndex(spark, dir)
    assert(inv() == want, "compaction must not change the inventory")
    val bktDirs = physicalDir(s"$dir/rows").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
    assert(bktDirs.nonEmpty)
    bktDirs.foreach { bd =>
      assert(bd.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"expected one file per bucket after compaction in ${bd.getName}")
    }
  }

  test("lookup prunes to the identifier's one bucket and finds exactly " +
    "the holding docs") {
    val dir = tmp("ent_lkp")
    EntityIndex.writeEntityIndex(docsT, dir)
    val nDocs = docsT.count()
    // the corpus-wide footer phone: every doc, one occurrence
    val phone = EntityIndex.lookupEntity(spark, dir, "555-867-5309")
    val plan = phone.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bkt"),
      s"lookup must partition-prune to the entity's bucket\n$plan")
    val rows = phone.collect()
    assert(rows.length.toLong == nDocs && rows.forall(_.getLong(2) == 1L))
    // a per-doc email: exactly its one doc
    val someId = docsT.select("doc_id").head().getLong(0)
    val mail = EntityIndex.lookupEntity(spark, dir,
      s"user$someId@mail.example.com").collect()
    assert(mail.map(_.getLong(0)).toSeq == Seq(someId))
    // an identifier the corpus never held
    assert(EntityIndex.lookupEntity(spark, dir, "nobody@nowhere.test").isEmpty)
  }

  test("the governance loop composes: discover via the entity index, " +
    "forget the discovered docs in the BM25 index, purge everywhere") {
    val entDir = tmp("ent_gov")
    val txtDir = tmp("ent_txt")
    EntityIndex.writeEntityIndex(docsT, entDir)
    TextIndex.writeTextIndex(docsT, txtDir)
    // the delete request names one shared identifier (an ip bucket
    // several docs collide into) — discovery returns ALL holders
    val someIp = EntityIndex.inventoryFromIndex(spark, entDir)
      .filter(col("kind") === "ip" && col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("entity").asc)
      .select("entity").head().getString(0)
    val holders = EntityIndex.lookupEntity(spark, entDir, someIp, Some("ip"))
      .select("doc_id")
    val holderIds = holders.collect().map(_.getLong(0)).toSet
    assert(holderIds.size > 1, "fixture must share the ip across docs")
    // enforcement: forget the holders in BOTH indexes
    TextIndex.forgetFromTextIndex(spark, txtDir, holders)
    EntityIndex.forgetFromEntityIndex(spark, entDir, holders)
    // the BM25 read equals the batch scorer over the survivors
    val survivors = docsT.filter(!col("doc_id").isInCollection(holderIds))
    val want = Scoring.bm25Q(survivors).collect().map(_.toString).sorted.toSeq
    val got = TextIndex.bm25FromIndex(spark, txtDir)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, "discovered docs must vanish from retrieval")
    // the inventory no longer names the identifier at all
    val inv2 = EntityIndex.inventoryFromIndex(spark, entDir)
      .filter(col("entity") === someIp).collect()
    assert(inv2.isEmpty, "the identifier must leave the inventory")
    // and its lookup is empty
    assert(EntityIndex.lookupEntity(spark, entDir, someIp).isEmpty)
    // purge both; physical erasure
    EntityIndex.compactEntityIndex(spark, entDir)
    TextIndex.compactTextIndex(spark, txtDir)
    assert(Tombstones.read(spark, entDir).isEmpty)
    assert(spark.read.parquet(physicalDir(s"$entDir/rows").getPath)
      .filter(col("doc_id").isInCollection(holderIds)).count() == 0L)
    assert(TextIndex.bm25FromIndex(spark, txtDir)
      .collect().map(_.toString).sorted.toSeq == want)
  }
}
