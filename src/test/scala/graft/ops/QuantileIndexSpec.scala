package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

/** Additive quantile-histogram laws: append == rebuild for any split,
  * compaction preserves the folded triples, and the CONTAINMENT law —
  * the reported enclosure [v_lo, v_hi] must bracket the exact
  * continuous quantile of the underlying rows. */
class QuantileIndexSpec extends SparkSuite {

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private lazy val li = Tables.lineitem(spark, sf)

  test("additivity: append == rebuild for an arbitrary split") {
    val incDir = tmp("qi_inc")
    QuantileIndex.writeQuantileIndex(li.filter(col("l_orderkey") % 3 === 0), incDir)
    QuantileIndex.appendToQuantileIndex(li.filter(col("l_orderkey") % 3 =!= 0), incDir)
    val rbDir = tmp("qi_rb")
    QuantileIndex.writeQuantileIndex(li, rbDir)
    val inc = QuantileIndex.quantilesFromIndex(spark, incDir)
      .collect().map(_.toString).sorted.toSeq
    val rb = QuantileIndex.quantilesFromIndex(spark, rbDir)
      .collect().map(_.toString).sorted.toSeq
    assert(inc == rb)
  }

  test("compaction preserves the folded histogram and collapses files") {
    val dir = tmp("qi_cmp")
    QuantileIndex.writeQuantileIndex(li.filter(col("l_orderkey") % 4 === 0), dir)
    (1 to 3).foreach(i =>
      QuantileIndex.appendToQuantileIndex(li.filter(col("l_orderkey") % 4 === i), dir))
    val before = QuantileIndex.quantilesFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    def nFiles = physicalDir(s"$dir/hist").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val filesBefore = nFiles
    QuantileIndex.compactQuantileIndex(spark, dir)
    val after = QuantileIndex.quantilesFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
    assert(nFiles == 1 && filesBefore > 1)
  }

  test("containment: the enclosure brackets the exact continuous quantile") {
    val dir = tmp("qi_law")
    QuantileIndex.writeQuantileIndex(li, dir)
    val enc = QuantileIndex.quantilesFromIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    QuantileIndex.Lanes.foreach { cn =>
      val vs = li.filter(col(cn).isNotNull)
        .select(col(cn).cast("double")).collect().map(_.getDouble(0)).sorted
      QuantileIndex.Ps.foreach { p =>
        val (n, lo, hi) = enc((cn, p))
        assert(n == vs.length)
        val pos = p * (n - 1).toDouble
        val exact = {
          val l = vs(math.floor(pos).toInt); val h = vs(math.ceil(pos).toInt)
          l + (pos - math.floor(pos)) * (h - l)
        }
        assert(lo <= exact && exact <= hi,
          s"$cn p=$p: exact $exact outside enclosure [$lo, $hi]")
        // the enclosure is a bucket, not the whole range: width ≤ 2·16
        assert(hi - lo <= 2 * QuantileIndex.BucketWidth,
          s"$cn p=$p enclosure too wide: [$lo, $hi]")
      }
    }
  }
}
