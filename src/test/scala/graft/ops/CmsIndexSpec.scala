package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Count-min sketch laws: one-sided error over EVERY vocab token (not
  * just the declared top-k), additivity (append == rebuild for any
  * split), compaction preservation + file collapse, and the
  * metadata-size bound that makes the sketch a valid persisted index at
  * any corpus size. */
class CmsIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def docs(ids: Seq[Long]) =
    ids.map(i => (i, s"alpha beta common$i tail v${i % 5} alpha"))
      .toDF("doc_id", "text")

  test("one-sided error: estimate >= exact for every vocab token") {
    val d = docs(1L to 200L)
    val exact = CmsIndex.termCounts(d)
      .select(col("token"), col("n").as("n_exact"))
    val dir = tmp("cms_err")
    CmsIndex.writeCmsIndex(d, dir)
    val allTokens = exact.select("token").as[String].collect().toSeq
    val est = CmsIndex.estimatesFromIndex(spark, dir, allTokens)
    val joined = exact.join(est, "token").collect()
    assert(joined.length == allTokens.length)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
        s"CMS underestimated '${r.getString(0)}'")
    }
  }

  test("additivity: append == rebuild for an arbitrary corpus split") {
    val all = 1L to 120L
    val (a, b) = all.partition(_ % 7 < 3) // uneven, interleaved split
    val incDir = tmp("cms_inc")
    CmsIndex.writeCmsIndex(docs(a), incDir)
    CmsIndex.appendToCmsIndex(docs(b), incDir)
    val rbDir = tmp("cms_rb")
    CmsIndex.writeCmsIndex(docs(all), rbDir)
    val inc = CmsIndex.sketchFromIndex(spark, incDir)
      .collect().map(_.toString).sorted.toSeq
    val rb = CmsIndex.sketchFromIndex(spark, rbDir)
      .collect().map(_.toString).sorted.toSeq
    assert(inc == rb)
  }

  test("compaction preserves the folded counters and collapses files") {
    val dir = tmp("cms_cmp")
    CmsIndex.writeCmsIndex(docs(1L to 40L), dir)
    CmsIndex.appendToCmsIndex(docs(41L to 60L), dir)
    CmsIndex.appendToCmsIndex(docs(61L to 80L), dir)
    val before = CmsIndex.sketchFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    def nFiles = physicalDir(s"$dir/sketch").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val filesBefore = nFiles
    CmsIndex.compactCmsIndex(spark, dir)
    val after = CmsIndex.sketchFromIndex(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "compaction changed the folded counters")
    assert(nFiles < filesBefore,
      s"compaction must collapse the per-batch partial files ($filesBefore -> $nFiles)")
    assert(nFiles == 1)
  }

  test("sketch stays metadata-sized: <= Depth*Width rows at any corpus size") {
    val dir = tmp("cms_size")
    CmsIndex.writeCmsIndex(docs(1L to 500L), dir)
    CmsIndex.appendToCmsIndex(docs(501L to 1000L), dir)
    CmsIndex.compactCmsIndex(spark, dir)
    val n = spark.read.parquet(physicalDir(s"$dir/sketch").getPath).count()
    assert(n <= CmsIndex.Depth.toLong * CmsIndex.Width,
      s"sketch grew past the grid bound: $n rows")
  }

  test("declared query: top-k join carries exact counts; estimates match a driver replay") {
    val d = docs(1L to 60L)
    val rows = CmsIndex.cmsTopKQ(d, k = 5).collect()
    PipelineCaches.release(spark)
    assert(rows.length == 5)
    // driver replay of the sketch over the exact term counts
    val tc = CmsIndex.termCounts(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def bucket(tok: String, dd: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cms$dd:$tok".getBytes("UTF-8"))
        .map(bb => f"$bb%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % CmsIndex.Width
    }
    val grid = scala.collection.mutable.Map.empty[(Int, Long), Long]
    tc.foreach { case (tok, n) =>
      (0 until CmsIndex.Depth).foreach { dd =>
        val k2 = (dd, bucket(tok, dd))
        grid(k2) = grid.getOrElse(k2, 0L) + n
      }
    }
    rows.foreach { r =>
      val tok = r.getString(0)
      assert(r.getAs[Long]("n_exact") == tc(tok))
      val want = (0 until CmsIndex.Depth)
        .map(dd => grid((dd, bucket(tok, dd)))).min
      assert(r.getAs[Long]("n_est") == want, s"estimate for '$tok'")
    }
  }

  test("append refuses a differently-shaped sketch (param guard)") {
    // the guard reads meta; simulate a foreign meta file
    val dir = tmp("cms_guard")
    CmsIndex.writeCmsIndex(docs(1L to 5L), dir)
    spark.range(1).select(lit(8).as("depth"), lit(512).as("width"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException] {
      CmsIndex.appendToCmsIndex(docs(6L to 9L), dir)
    }
    assert(e.getMessage.contains("different parameters"))
  }
}
