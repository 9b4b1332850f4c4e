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
    val perSlice = spark.read.parquet(s"$dir/sketch")
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

  test("sourceOverlapIncrQ matches the one-shot sketch over the full fixture") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = rows(KmvIndex.sourceOverlapIncrQ(spark, sf))
    val one = tmp()
    KmvIndex.writeKmvIndex(docs, one)
    assert(got == rows(KmvIndex.overlapFromIndex(spark, one)))
  }
}
