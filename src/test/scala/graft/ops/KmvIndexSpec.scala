package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Laws for the seventeenth persisted index (per-slice KMV sketches):
  * the merge law makes any doc-complete append split read identically
  * to a one-shot build, compaction collapses to ≤ k rows per slice
  * while preserving every readout, a crash before the swap leaves the
  * old generation readable, and the estimates obey the KMV error law
  * against driver-computed truth. */
class KmvIndexSpec extends SparkSuite {

  private def rows(df: DataFrame): Set[Row] = {
    val out = df.collect().toSet
    PipelineCaches.release(spark)
    out
  }

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("kmv_idx_spec").toFile
    d.deleteOnExit(); d.getPath + "/idx"
  }

  test("merge law: index over any append split equals the one-shot build") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val one = tmp()
    KmvIndex.writeKmvIndex(docs, one)
    val want = rows(KmvIndex.overlapFromIndex(spark, one))
    assert(want.nonEmpty)

    val split = tmp()
    KmvIndex.writeKmvIndex(docs.filter(col("doc_id") % 3 === 0), split)
    KmvIndex.appendToKmvIndex(docs.filter(col("doc_id") % 3 === 1), split)
    KmvIndex.appendToKmvIndex(docs.filter(col("doc_id") % 3 === 2), split)
    assert(rows(KmvIndex.overlapFromIndex(spark, split)) == want,
      "bottom-k of a union must equal k smallest of the shards' bottom-ks")
  }

  test("compaction collapses to <= k rows per slice and preserves reads; " +
    "crash before the swap leaves the old generation readable") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val dir = tmp()
    KmvIndex.writeKmvIndex(docs.filter(col("doc_id") % 2 === 0), dir, k = 64)
    KmvIndex.appendToKmvIndex(docs.filter(col("doc_id") % 2 === 1), dir)
    val before = rows(KmvIndex.overlapFromIndex(spark, dir))

    case class Boom() extends RuntimeException("injected")
    DirSwap.crashBeforeSwap = Some(_ => throw Boom())
    try intercept[Boom](KmvIndex.compactKmvIndex(spark, dir))
    finally DirSwap.crashBeforeSwap = None
    assert(rows(KmvIndex.overlapFromIndex(spark, dir)) == before,
      "a pre-swap crash must leave the live sketch untouched")

    KmvIndex.compactKmvIndex(spark, dir)
    assert(rows(KmvIndex.overlapFromIndex(spark, dir)) == before,
      "compaction must preserve every readout")
    val perSlice = spark.read.parquet(physicalDir(s"$dir/sketch").getPath)
      .groupBy(col("slice")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(perSlice.nonEmpty && perSlice.forall(_ <= 64L),
      s"compacted sketch must hold <= k rows per slice: ${perSlice.max}")
  }

  test("estimates obey the KMV law against driver-computed truth") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val truth = docs.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.trim.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val dir = tmp()
    KmvIndex.writeKmvIndex(docs, dir)
    val got = KmvIndex.overlapFromIndex(spark, dir).collect()
    PipelineCaches.release(spark)
    assert(got.length == truth.keySet.toSeq.combinations(2).length)
    val bound = 5.0 / math.sqrt(256 - 2.0)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (na, nb) = (truth(a).size.toDouble, truth(b).size.toDouble)
      val unionTrue = (truth(a) ++ truth(b)).size.toDouble
      val jaccTrue = (truth(a) & truth(b)).size.toDouble / unionTrue
      assert(math.abs(r.getDouble(2) - na) <= bound * na + 1, s"n_a_est ($a,$b)")
      assert(math.abs(r.getDouble(3) - nb) <= bound * nb + 1, s"n_b_est ($a,$b)")
      assert(math.abs(r.getDouble(6) - unionTrue) <= bound * unionTrue + 1,
        s"union_est ${r.getDouble(6)} vs $unionTrue ($a,$b)")
      assert(math.abs(r.getDouble(7) - jaccTrue) <= bound + 1e-9,
        s"jaccard_est ${r.getDouble(7)} vs $jaccTrue ($a,$b)")
    }
  }

  test("rebuild-on-forget erasure drill (SURVEY §2.5 exemption row): the " +
    "survivor rebuild IS the whole procedure — the rebuilt store equals a " +
    "never-saw-victims build bit-identically, and no victim token leaves " +
    "residue the estimator (or anything reading the stored hashes) can " +
    "surface") {
    import spark.implicits._
    val survivors = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text", "source")
    // victims carry sentinel-unique tokens, so erasure is checkable at
    // the stored-hash level: md5 is one-way, but equality of the hash
    // SET against a never-saw-victims build is the strongest observable
    // statement a sketch store can make — plus an explicit no-victim-
    // hash-remains sweep
    val victims = survivors.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(40)), i =>
          concat(lit("victimsentinel"), col("doc_id"), lit("x"), i)))
          .as("text"),
        col("source"))
    val tainted = survivors.unionByName(victims)

    graft.functions.Md5Bits.register(spark)
    val victimHashes = victims
      .select(explode(filter(TextOps.toks(col("text")), t => t =!= ""))
        .as("token"))
      .select(call_function(graft.functions.Md5Bits.FnName,
        col("token"), lit(0), lit(13)).as("th"))
      .distinct().as[Long].collect().toSet
    def stored(dir: String): Set[(String, Long)] =
      spark.read.parquet(physicalDir(s"$dir/sketch").getPath)
        .select(col("slice"), col("th")).as[(String, Long)].collect().toSet

    val dir = tmp()
    KmvIndex.writeKmvIndex(tainted, dir)
    assert(stored(dir).exists(r => victimHashes(r._2)),
      "drill setup: victim hashes must occupy sketch slots pre-erasure")

    // the erasure procedure named by the exemption: one survivor rebuild
    KmvIndex.writeKmvIndex(survivors, dir)

    val never = tmp()
    KmvIndex.writeKmvIndex(survivors, never)
    assert(stored(dir) == stored(never),
      "rebuilt store must be bit-identical to a never-saw-victims build")
    assert(!stored(dir).exists(r => victimHashes(r._2)),
      "no victim token hash may survive the rebuild")
    assert(rows(KmvIndex.overlapFromIndex(spark, dir)) ==
      rows(KmvIndex.overlapFromIndex(spark, never)),
      "every estimator readout must equal the never-saw-victims build")
  }

  test("sourceOverlapIncrQ matches the one-shot sketch over the full fixture") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = rows(KmvIndex.sourceOverlapIncrQ(spark, sf))
    val one = tmp()
    KmvIndex.writeKmvIndex(docs, one)
    assert(got == rows(KmvIndex.overlapFromIndex(spark, one)))
  }
}
